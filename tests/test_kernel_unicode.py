"""Unit vectors re-derived from the reference test suite (FIXTURES.md §4)."""

from rtfproc_spark.kernel import (
    DBSQ,
    cdpt_from_utf16,
    cpgfromcharsetnum,
    cpgtou,
    utf8_from_cdpt,
    utf16_from_cdpt,
)


def test_utf8_from_cdpt_vectors():
    # test/utf8test.c:31-46
    assert utf8_from_cdpt(97) == b"a"
    assert utf8_from_cdpt(0x1F600) == "😀".encode()
    assert utf8_from_cdpt(0x1F608) == "😈".encode()
    assert utf8_from_cdpt(0x2000B) == "𠀋".encode()
    assert utf8_from_cdpt(0x2B8B8) == "𫢸".encode()
    assert utf8_from_cdpt(0) == b""
    assert utf8_from_cdpt(0 - 0x7FFFFFFF) == b""
    assert utf8_from_cdpt(-1) == b""  # (int32_t)0xFFFFFFFF
    assert utf8_from_cdpt(0x110000) == b""


def test_utf8_two_byte_and_surrogate_passthrough():
    assert utf8_from_cdpt(0xAB) == "«".encode()
    # WTF-8: lone surrogates encode as plain 3-byte sequences
    assert utf8_from_cdpt(0xD83D) == bytes((0xED, 0xA0, 0xBD))


def test_surrogate_math():
    # test/interactive-cdpt_from_surrogate_pair-test.c:22-48
    assert cdpt_from_utf16(0xD83D, 0xDE00) == 0x1F600
    assert cdpt_from_utf16(0, 0x2764) == 0x2764  # neither surrogate -> lo
    assert cdpt_from_utf16(0xD83D, 0x0041) == ord("?")  # mixed -> '?'
    assert cdpt_from_utf16(0x0041, 0xDE00) == ord("?")
    hi, lo = utf16_from_cdpt(0x1F600)
    assert (hi, lo) == (0xD83D, 0xDE00)
    assert utf16_from_cdpt(0x2764) == (0, 0x2764)


def test_cpgtou_shiftjis_stream():
    # test/cpgtoutest.c:22-46 — charset 128 byte stream with DBCS carry
    data = bytes(
        (
            0x94, 0x45, 0x8E, 0xD2, 0x90, 0xED, 0x8E, 0x6D, 0x82, 0xAA,
            0x8E, 0x98, 0x82, 0xF0, 0x93, 0x7C, 0x82, 0xB7, 0x81, 0x42,
        )
    )
    cpg = cpgfromcharsetnum(128)
    assert cpg == 932
    out = []
    xtra = 0
    for b in data:
        res, xtra = cpgtou(cpg, b, xtra)
        if res is DBSQ:
            continue
        if isinstance(res, str):
            out.append(res)
    assert "".join(out) == "忍者戦士が侍を倒す。"


def test_cpgtou_cp1252_defaults():
    # codepage 0 is the ANSI default — the letter fixture's \'ab guillemets
    res, xtra = cpgtou(0, 0xAB, 0)
    assert res == "«" and xtra == 0
    res, _ = cpgtou(1252, 0xBB, 0)
    assert res == "»"
    # cp1252 undefined byte -> silent drop (cpNONE)
    from rtfproc_spark.kernel import NONE

    res, _ = cpgtou(1252, 0x81, 0)
    assert res is NONE


def test_cpgtou_unsupported_codepage():
    from rtfproc_spark.kernel import UNSP

    res, _ = cpgtou(None, 0x41, 0)
    assert res is UNSP
    res, _ = cpgtou(42, 0x41, 0)  # Symbol
    assert res is UNSP


def test_cold_cache_dbcs_first_decode():
    """Regression: the very FIRST cp932 decode in a fresh process must not
    be corrupted by the _is_dbcs probe. The probe used to leave a buffered
    0x81 lead byte in the SHARED decoder, so the first \\'94 decoded as the
    pair (0x81, 0x94) = U+FF03 and the wrong result was memoized for the
    process lifetime (surfaced as a first-use-per-executor flake)."""
    from rtfproc_spark.kernel import codepage as cp

    saved = (dict(cp._RESULT_CACHE), dict(cp._DBCS_CACHE), dict(cp._DECODER_CACHE))
    try:
        cp._RESULT_CACHE.clear()
        cp._DBCS_CACHE.clear()
        cp._DECODER_CACHE.clear()
        res, xtra = cp.cpgtou(932, 0x94, 0)
        assert res is cp.DBSQ and xtra == 0x94  # lead byte, NOT a pair
        res2, _ = cp.cpgtou(932, 0x45, 0x94)
        assert res2 == "忍"  # (0x94,0x45) -> 忍
        # cold-cache decode of byte 0 under cp932 (hit via hex-table builds)
        cp._RESULT_CACHE.clear()
        cp._DBCS_CACHE.clear()
        cp._DECODER_CACHE.clear()
        res3, _ = cp.cpgtou(932, 0x00, 0)
        assert res3 == "\x00"
    finally:
        cp._RESULT_CACHE.update(saved[0])
        cp._DBCS_CACHE.update(saved[1])
        cp._DECODER_CACHE.update(saved[2])
