/* Generic CLI driver for the shim-built reference engine:
 *   refcli INPUT OUTPUT [KEY VALUE]...
 *   refcli --txt TEXTOUT INPUT OUTPUT [KEY VALUE]...
 * (mirrors test/letter.c's structure with replacements from argv). */
#include <stdio.h>
#include <stdlib.h>
#include "rtfproc.h"
#include "utillib.h"

#include <string.h>

int main(int argc, char **argv) {
    FILE *ftxt = NULL;
    if (argc >= 3 && strcmp(argv[1], "--txt") == 0) {
        ftxt = fopen(argv[2], "wb");
        argv += 2;
        argc -= 2;
    }
    if (argc < 3 || (argc - 3) % 2 != 0) {
        fprintf(stderr, "usage: refcli [--txt TEXTOUT] INPUT OUTPUT [KEY VALUE]...\n");
        return 2;
    }
    FILE *fin = fopen(argv[1], "rb");
    FILE *fout = fopen(argv[2], "wb");
    if (!fin || !fout) { fprintf(stderr, "open failed\n"); return 2; }

    int npairs = (argc - 3) / 2;
    const char **replacements = malloc(sizeof(char *) * (2 * npairs + 1));
    for (int i = 0; i < 2 * npairs; i++) replacements[i] = argv[3 + i];
    replacements[2 * npairs] = NULL;

    rtfobj *R = new_rtfobj(fin, fout, ftxt);
    if (npairs) add_rtfobj_replacements(R, replacements);
    rtfreplace(R);
    delete_rtfobj(R);
    fclose(fin);
    fclose(fout);
    if (ftxt) fclose(ftxt);
    free(replacements);
    return 0;
}
