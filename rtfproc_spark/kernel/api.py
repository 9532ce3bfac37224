"""String-level kernel API (the reference's entry-point surface, SURVEY.md §2 A29).

- ``rtf_replace(text, pairs)``: match-and-replace round trip — the
  ``rtfreplace`` flagship (/root/reference/src/rtfproc.c:281-306).
- ``rtf_strip(text)``: RTF -> plain text — the README callback example
  (/root/reference/README.md:30-35) expressed as extraction with no keys.
- ``rtf_extract(text, pairs)``: one pass producing BOTH outputs plus error
  and stats, mirroring the dual fout/ftxt streams.

Spark-facing vectorized wrappers live in ``rtfproc_spark.functions``.
"""

from __future__ import annotations

from .engine import ReplacementSet, RTFEngine, empty_replacements


def _as_bytes(text: str | bytes) -> bytes:
    return text.encode("utf-8") if isinstance(text, str) else bytes(text)


def _as_str(b: bytes) -> str:
    # rtf_out stays valid UTF-8 whenever the input cell was (splices insert
    # only ASCII and {\uc0 \u%d} groups); plain_text may legitimately contain
    # stray continuation bytes (the \uc-countdown quirk), so decode
    # defensively for the string surface. Byte-exact comparisons should use
    # rtf_extract_bytes.
    return b.decode("utf-8", errors="replace")


def compile_replacements(pairs) -> ReplacementSet:
    """Build an ordered, no-dedupe replacement set (bulk-load semantics)."""
    if pairs is None:
        return empty_replacements()
    if isinstance(pairs, ReplacementSet):
        return pairs
    return ReplacementSet(pairs)


def rtf_extract_bytes(
    data: bytes, rs: ReplacementSet | None = None
) -> tuple[bytes, bytes, str | None]:
    return RTFEngine(rs).run(data)


def rtf_extract(text: str | bytes, pairs=None) -> dict:
    rs = compile_replacements(pairs)
    rtf_out, plain, err = RTFEngine(rs).run(_as_bytes(text))
    return {
        "rtf_out": _as_str(rtf_out),
        "plain_text": _as_str(plain),
        "error": err,
        "n_bytes_in": len(_as_bytes(text)),
        "n_bytes_out": len(rtf_out),
        "n_text_bytes": len(plain),
    }


def rtf_replace(text: str | bytes, pairs) -> str:
    rs = compile_replacements(pairs)
    rtf_out, _, _ = RTFEngine(rs).run(_as_bytes(text))
    return _as_str(rtf_out)


def rtf_strip(text: str | bytes) -> str:
    _, plain, _ = RTFEngine(empty_replacements()).run(_as_bytes(text))
    return _as_str(plain)
