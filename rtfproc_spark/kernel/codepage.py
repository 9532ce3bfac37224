"""Codepage decoding — Python re-implementation of the empty cpgtou submodule.

The reference's cpgtou API (reconstructed from call sites, see SURVEY.md §1.4
and /root/reference/src/rtfproc.c:701-746, test/cpgtoutest.c) decodes one byte
at a time under a Windows codepage, with a one-byte DBCS carry (``xtra``) and
four sentinels:

- ``DBSQ``: first byte of a double-byte sequence — wait for the next byte
- a multi-codepoint expansion (cpMULT) — we just return a str of length > 1
- ``NONE``: byte has no mapping in this codepage — emit nothing
- ``UNSP``: unsupported codepage — emit nothing

We build on Python's incremental codecs, which implement the same Windows
codepage tables (charset tables are public knowledge, per the RTF 1.9 spec
``\\fcharsetN`` documentation).
"""

from __future__ import annotations

import codecs

# Sentinels (distinct objects; decode results are str otherwise)
DBSQ = object()  # first byte of a double-byte sequence; carry it
NONE = object()  # no mapping for this byte in this codepage
UNSP = object()  # unsupported codepage

# Truthy "unsupported codepage" id: the reference's cpgfromcharsetnum returns
# a non-zero id for unknown charsets, so the \'hh fallback
# ``attr->codepage ? attr->codepage : documentcodepage`` (rtfproc.c:708) keeps
# the unsupported id and cpgtou answers cpUNSP (silent drop) — it must NOT
# fall back to the document codepage.
UNSP_CPG = -99


# RTF \fcharsetN -> Windows codepage (public mapping from the RTF 1.9 spec).
_CHARSET_TO_CPG: dict[int, int] = {
    0: 1252,  # ANSI
    1: 0,  # Default -> document default
    2: 42,  # Symbol (unsupported by Python codecs -> UNSP)
    77: 10000,  # Mac Roman
    78: 10001,  # Mac Shift-JIS
    128: 932,  # Shift-JIS (exercised by test/cpgtoutest.c:41)
    129: 949,  # Hangul
    130: 1361,  # Johab
    134: 936,  # GB2312
    136: 950,  # Big5
    161: 1253,  # Greek
    162: 1254,  # Turkish
    163: 1258,  # Vietnamese
    177: 1255,  # Hebrew
    178: 1256,  # Arabic
    186: 1257,  # Baltic
    204: 1251,  # Cyrillic
    222: 874,  # Thai
    238: 1250,  # Eastern European
    254: 437,  # PC 437
    255: 850,  # OEM
}

# Windows codepage number -> Python codec name. Codepage 0 is the "ANSI
# default" (the reference's zero-initialized documentcodepage decodes the
# letter fixture's \'ab/\'bb as cp1252 guillemets).
_CPG_TO_CODEC: dict[int, str] = {
    0: "cp1252",
    437: "cp437",
    850: "cp850",
    874: "cp874",
    932: "cp932",
    936: "cp936",
    949: "cp949",
    950: "cp950",
    1250: "cp1250",
    1251: "cp1251",
    1252: "cp1252",
    1253: "cp1253",
    1254: "cp1254",
    1255: "cp1255",
    1256: "cp1256",
    1257: "cp1257",
    1258: "cp1258",
    10000: "mac_roman",
}

_DECODER_CACHE: dict[int, codecs.IncrementalDecoder] = {}


def cpgfromcharsetnum(charset: int) -> int:
    """RTF ``\\fcharsetN`` -> codepage id; UNSP_CPG (truthy, unsupported)
    for unknown charsets — matches the reference, where an unknown charset
    yields a codepage id that cpgtou maps to cpUNSP (rtfproc.c:796,819)."""
    return _CHARSET_TO_CPG.get(charset, UNSP_CPG)


def _decoder(cpg: int) -> codecs.IncrementalDecoder | None:
    dec = _DECODER_CACHE.get(cpg)
    if dec is None:
        codec = _CPG_TO_CODEC.get(cpg)
        if codec is None:
            return None
        dec = codecs.getincrementaldecoder(codec)("strict")
        _DECODER_CACHE[cpg] = dec
    dec.reset()
    return dec


_RESULT_CACHE: dict[tuple, tuple] = {}


def cpgtou(cpg: int | None, byte: int, xtra: int):
    """Decode one byte under codepage ``cpg`` with DBCS carry ``xtra``.

    Returns ``(result, new_xtra)`` where result is a str (possibly
    multi-char, i.e. cpMULT), or one of DBSQ / NONE / UNSP.
    Mirrors the call contract at /root/reference/src/rtfproc.c:713.
    Memoized: the (cpg, xtra, byte) -> result map is a pure function.
    """
    ck = (cpg, xtra, byte)
    hit = _RESULT_CACHE.get(ck)
    if hit is None:
        hit = _RESULT_CACHE[ck] = _cpgtou_uncached(cpg, byte, xtra)
    return hit


_DBCS_CACHE: dict[int | None, bool] = {}


def _is_dbcs(cpg: int | None) -> bool:
    """True iff the codepage has lead bytes (a 1-byte feed can buffer).

    Probes a PRIVATE decoder instance: probing the shared cached decoder
    and breaking mid-loop would leave a buffered lead byte (0x81 for cp932)
    that silently prepends itself to the caller's next decode — and the
    corrupted result would then be memoized in _RESULT_CACHE for the
    process lifetime (found as a first-use-per-worker flake in the strip
    oracle; pinned by tests/test_kernel_unicode.py::test_cold_cache_dbcs).
    """
    v = _DBCS_CACHE.get(cpg)
    if v is None:
        v = False
        codec = _CPG_TO_CODEC.get(cpg)
        if codec is not None:
            dec = codecs.getincrementaldecoder(codec)("strict")
            for b in range(256):
                dec.reset()
                try:
                    if dec.decode(bytes((b,)), final=False) == "":
                        v = True
                        break
                except UnicodeDecodeError:
                    pass
        _DBCS_CACHE[cpg] = v
    return v


def _cpgtou_uncached(cpg: int | None, byte: int, xtra: int):
    # The reference's cpgtou consults xtra only on DBCS codepages and leaves
    # it UNTOUCHED otherwise (verified vs the shim-built binary: a cp932
    # carry byte survives a \cchs switch to a single-byte codepage and is
    # not consumed by it).
    # NB: classify BEFORE fetching the shared decoder — _decoder() resets
    # it, so nothing may touch it between here and the decode below.
    dbcs = _is_dbcs(cpg)
    dec = _decoder(cpg)
    if dec is None:
        return UNSP, xtra  # unsupported codepage: carry untouched
    if dbcs and xtra:
        try:
            s = dec.decode(bytes((xtra, byte)), final=True)
        except UnicodeDecodeError:
            return NONE, 0
        return (s if s else NONE), 0
    keep = 0 if dbcs else xtra
    try:
        s = dec.decode(bytes((byte,)), final=False)
    except UnicodeDecodeError:
        return NONE, keep
    if s:
        return s, keep
    # Single byte buffered: it is a DBCS lead byte.
    return DBSQ, byte


_HEX_TABLE_CACHE: dict[int | None, list | None] = {}


def single_byte_table(cpg: int | None):
    """256-entry byte -> UTF-8 bytes table for SINGLE-BYTE codepages, or
    None when the codepage is unsupported or has DBCS lead bytes (stateful
    decoding must go through cpgtou). Undefined bytes map to b"" (cpNONE
    silence)."""
    if cpg in _HEX_TABLE_CACHE:
        return _HEX_TABLE_CACHE[cpg]
    table: list | None = []
    for b in range(256):
        res, _ = cpgtou(cpg, b, 0)
        if res is DBSQ or res is UNSP:
            table = None
            break
        table.append(b"" if res is NONE else res.encode("utf-8"))
    _HEX_TABLE_CACHE[cpg] = table
    return table
