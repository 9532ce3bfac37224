/* Minimal utillib shim — the reference repo's utillib submodule is an empty
 * directory in the snapshot; this supplies just enough (macros + unicode
 * helpers, reconstructed from call sites per SURVEY.md §1.4) to COMPILE the
 * reference's own sources unmodified for benchmarking. This is support
 * scaffolding, not part of the engine. */
#ifndef UTILLIB_SHIM_H
#define UTILLIB_SHIM_H

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <inttypes.h>

#define BEGIN_FUNCTION
#define VOID
#define RETURN(...) return __VA_ARGS__
#define FAIL(ret, ...) do { return ret; } while (0)
#define LOG(...) (1)
#define DBUG(...) ((void)0)
#define DIE(...) (fprintf(stderr, __VA_ARGS__), exit(1), 0)
#define memzero(p, n) memset((p), 0, (n))

unsigned char *utf8_from_cdpt(int32_t c);
int32_t cdpt_from_utf16(uint16_t hi, uint16_t lo);
void utf16_from_cdpt(int32_t cdpt, uint16_t *hi, uint16_t *lo);
int32_t cdpt_from_utf8(const unsigned char *s);

#endif
