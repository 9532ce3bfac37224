"""Unicode codec kernels.

Re-implements (from public RTF 1.9 / Unicode 15.0 specs and the behavior
pinned by the reference test suite) the utillib/cpgtou helpers whose
submodules are empty in the reference snapshot:

- ``utf8_from_cdpt``      (behavior pinned by /root/reference/test/utf8test.c:31-46
  and the reference impl shown in
  /root/reference/test/interactive-cdpt_from_surrogate_pair-test.c:51-81)
- ``cdpt_from_utf16``     (/root/reference/test/interactive-cdpt_from_surrogate_pair-test.c:22-48)
- ``utf16_from_cdpt``     (call site /root/reference/src/rtfproc.c:1138)
- ``cdpt_from_utf8``      (call site /root/reference/src/rtfproc.c:1137)

These are deliberately WTF-8-ish: lone surrogate code points encode as
3-byte sequences (no special-casing), exactly like the reference encoder.
"""

from __future__ import annotations


def utf8_from_cdpt(cdpt: int) -> bytes:
    """Encode one code point as UTF-8 bytes.

    Returns b"" for cdpt <= 0 or cdpt > 0x10FFFF (the reference writes a
    NUL first byte, i.e. an empty C string — test/utf8test.c:38-46).
    Surrogate code points are encoded as ordinary 3-byte sequences.
    """
    if cdpt <= 0:
        return b""
    if cdpt < 0x80:
        return bytes((cdpt,))
    if cdpt < 0x800:
        return bytes((0xC0 | (cdpt >> 6), 0x80 | (cdpt & 0x3F)))
    if cdpt < 0x10000:
        return bytes(
            (0xE0 | (cdpt >> 12), 0x80 | ((cdpt >> 6) & 0x3F), 0x80 | (cdpt & 0x3F))
        )
    if cdpt < 0x110000:
        return bytes(
            (
                0xF0 | (cdpt >> 18),
                0x80 | ((cdpt >> 12) & 0x3F),
                0x80 | ((cdpt >> 6) & 0x3F),
                0x80 | (cdpt & 0x3F),
            )
        )
    return b""


def cdpt_from_utf16(hi: int, lo: int) -> int:
    """Combine a UTF-16 pair into a code point.

    Both surrogates -> combined astral code point; neither -> lo (BMP);
    exactly one -> '?' (encoding error placeholder), mirroring
    test/interactive-cdpt_from_surrogate_pair-test.c:22-48.
    """
    hi &= 0xFFFF
    lo &= 0xFFFF
    hisurrogate = 0xD800 <= hi <= 0xDBFF
    losurrogate = 0xDC00 <= lo <= 0xDFFF
    if hisurrogate and losurrogate:
        return 0x10000 + (((hi - 0xD800) << 10) | (lo - 0xDC00))
    if not hisurrogate and not losurrogate:
        return lo
    return ord("?")


def utf16_from_cdpt(cdpt: int) -> tuple[int, int]:
    """Code point -> (hi, lo) UTF-16 units; hi == 0 for the BMP.

    Mirrors the submodule function used by the replacement re-encoder
    (/root/reference/src/rtfproc.c:1138).
    """
    if cdpt < 0x10000:
        return 0, cdpt & 0xFFFF
    v = cdpt - 0x10000
    return 0xD800 | (v >> 10), 0xDC00 | (v & 0x3FF)


def cdpt_from_utf8(b: bytes, i: int = 0) -> int:
    """Decode one UTF-8 sequence starting at offset ``i``.

    Permissive (no overlong/continuation validation) like the reference
    decoder: the caller guarantees well-formed input (replacement values).
    """
    c0 = b[i]
    if c0 < 0x80:
        return c0
    if c0 >> 5 == 0b110:
        return ((c0 & 0x1F) << 6) | (b[i + 1] & 0x3F)
    if c0 >> 4 == 0b1110:
        return ((c0 & 0x0F) << 12) | ((b[i + 1] & 0x3F) << 6) | (b[i + 2] & 0x3F)
    if c0 >> 3 == 0b11110:
        return (
            ((c0 & 0x07) << 18)
            | ((b[i + 1] & 0x3F) << 12)
            | ((b[i + 2] & 0x3F) << 6)
            | (b[i + 3] & 0x3F)
        )
    return ord("?")
