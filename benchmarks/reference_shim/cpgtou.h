/* Minimal cpgtou shim — API reconstructed from the reference's call sites
 * (SURVEY.md §1.4); tables generated from public codec data. */
#ifndef CPGTOU_SHIM_H
#define CPGTOU_SHIM_H

#include <stdint.h>

typedef int32_t cpg_t;

#define cpNONE (-1)
#define cpUNSP (-2)
#define cpDBSQ (-3)
#define cpMULT (-4)

int32_t cpgtou(cpg_t cpg, uint8_t byte, uint8_t *xtra, const int32_t **mult);
cpg_t cpgfromcharsetnum(int32_t charset);

#endif
