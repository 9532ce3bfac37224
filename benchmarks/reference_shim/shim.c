/* Shim implementations (see utillib.h header comment). */
#include <ctype.h>
#include <string.h>
#include "utillib.h"
#include "trex.h"
#include "cpgtou.h"

/* ---- unicode helpers (semantics pinned by reference test/utf8test.c and
 * test/interactive-cdpt_from_surrogate_pair-test.c) ---- */

unsigned char *utf8_from_cdpt(int32_t c) {
    static _Thread_local unsigned char u[5];
    if (c <= 0) { u[0] = 0; }
    else if (c < 0x80) { u[0] = (unsigned char)c; u[1] = 0; }
    else if (c < 0x800) {
        u[0] = 0xC0 | (c >> 6); u[1] = 0x80 | (c & 0x3F); u[2] = 0;
    } else if (c < 0x10000) {
        u[0] = 0xE0 | (c >> 12); u[1] = 0x80 | ((c >> 6) & 0x3F);
        u[2] = 0x80 | (c & 0x3F); u[3] = 0;
    } else if (c < 0x110000) {
        u[0] = 0xF0 | (c >> 18); u[1] = 0x80 | ((c >> 12) & 0x3F);
        u[2] = 0x80 | ((c >> 6) & 0x3F); u[3] = 0x80 | (c & 0x3F); u[4] = 0;
    } else { u[0] = 0; }
    return u;
}

int32_t cdpt_from_utf16(uint16_t hi, uint16_t lo) {
    int hisur = (0xD800 <= hi && hi <= 0xDBFF);
    int losur = (0xDC00 <= lo && lo <= 0xDFFF);
    if (hisur && losur) return 0x10000 + (((int32_t)(hi - 0xD800) << 10) | (lo - 0xDC00));
    if (!hisur && !losur) return lo;
    return '?';
}

void utf16_from_cdpt(int32_t cdpt, uint16_t *hi, uint16_t *lo) {
    if (cdpt < 0x10000) { *hi = 0; *lo = (uint16_t)cdpt; return; }
    cdpt -= 0x10000;
    *hi = 0xD800 | (cdpt >> 10);
    *lo = 0xDC00 | (cdpt & 0x3FF);
}

int32_t cdpt_from_utf8(const unsigned char *s) {
    unsigned char c0 = s[0];
    if (c0 < 0x80) return c0;
    if ((c0 >> 5) == 0x6) return ((c0 & 0x1F) << 6) | (s[1] & 0x3F);
    if ((c0 >> 4) == 0xE)
        return ((c0 & 0x0F) << 12) | ((s[1] & 0x3F) << 6) | (s[2] & 0x3F);
    if ((c0 >> 3) == 0x1E)
        return ((c0 & 0x07) << 18) | ((s[1] & 0x3F) << 12) |
               ((s[2] & 0x3F) << 6) | (s[3] & 0x3F);
    return '?';
}

/* ---- trex: ^ $ \d \s \x, ? optional-previous, else literal ---- */

static int class_match(unsigned char cls, unsigned char ch) {
    switch (cls) {
        case 'd': return isdigit(ch) != 0;
        case 's': return isspace(ch) != 0;
        case 'x': return isxdigit(ch) != 0;
        default:  return cls == ch; /* escaped literal */
    }
}

static int unit_len(const unsigned char *p) { return p[0] == '\\' ? 2 : 1; }

static int unit_match(const unsigned char *p, unsigned char ch) {
    return p[0] == '\\' ? class_match(p[1], ch) : (p[0] == ch);
}

static int rex_here(const unsigned char *p, const unsigned char *s) {
    for (;;) {
        if (p[0] == 0) return 1;
        if (p[0] == '$' && p[1] == 0) return s[0] == 0;
        int ul = unit_len(p);
        if (p[ul] == '?') {
            if (s[0] && unit_match(p, s[0]) && rex_here(p + ul + 1, s + 1)) return 1;
            p += ul + 1;
            continue;
        }
        if (p[ul] == '+') {
            if (!(s[0] && unit_match(p, s[0]))) return 0;
            s++;
            while (s[0] && unit_match(p, s[0])) {
                if (rex_here(p + ul + 1, s)) return 1;
                s++;
            }
            return rex_here(p + ul + 1, s);
        }
        if (!(s[0] && unit_match(p, s[0]))) return 0;
        p += ul;
        s++;
    }
}

int rexmatch(const unsigned char *pattern, const unsigned char *str) {
    if (pattern[0] == '^') return rex_here(pattern + 1, str);
    for (;; str++) {
        if (rex_here(pattern, str)) return 1;
        if (!str[0]) return 0;
    }
}

/* ---- cpgtou over generated tables ---- */

extern const int32_t cp1252_tab[256];
extern const uint8_t cp932_lead[256];
extern const int32_t cp932_single[256];
extern const int32_t cp932_pair[65536];

int32_t cpgtou(cpg_t cpg, uint8_t byte, uint8_t *xtra, const int32_t **mult) {
    (void)mult;
    if (cpg == 0 || cpg == 1252) {
        return cp1252_tab[byte];
    }
    if (cpg == 932) {
        if (*xtra) {
            int32_t v = cp932_pair[((int32_t)(*xtra) << 8) | byte];
            *xtra = 0;
            return v;
        }
        if (cp932_lead[byte]) { *xtra = byte; return cpDBSQ; }
        return cp932_single[byte];
    }
    return cpUNSP;
}

cpg_t cpgfromcharsetnum(int32_t charset) {
    switch (charset) {
        case 0: return 1252;
        case 128: return 932;
        default: return -99; /* unsupported -> cpUNSP in cpgtou */
    }
}
