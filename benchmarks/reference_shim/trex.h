/* Minimal trex shim — tiny regex used only by the reference's command
 * dispatch: ^ $ \d \s \x (hex digit), ? (optional previous), else literal. */
#ifndef TREX_SHIM_H
#define TREX_SHIM_H

int rexmatch(const unsigned char *pattern, const unsigned char *str);

#endif
