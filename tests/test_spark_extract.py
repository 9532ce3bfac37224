"""Spark extraction projection == pure-kernel oracle, per turn (SURVEY.md §7 M1)."""

import pandas as pd
import pytest

from rtfproc_spark.functions.rtf import make_extract_fn, with_rtf_extract
from rtfproc_spark.kernel import ReplacementSet, RTFEngine
from rtfproc_spark.sources.transcripts import (
    DEFAULT_REPLACEMENTS,
    golden_conversations,
    synthesize_transcripts_pdf,
)

LETTER_PAIRS = [
    ("«SSIC»", "1000"),
    ("«Office Code»", "B 0524"),
    ("«Date»", "13 Sep 21"),
    ("«Property Mgr Name»", "Shady Management"),
    ("«Property Mgr Addr»", "1234 Main Street"),
    ("«Property Mgr City»", "Woodbridge"),
    ("«Property Mgr State»", "VA"),
    ("«Property Mgr ZIP»", "22192"),
    ("«Client Rank»", "Colonel"),
    ("«Client Full Name»", "Chesty A. Puller"),
    ("«Client Last Name»", "Puller"),
    ("こんにちは！", "Bonjour."),
    ("JAMES", "BOOBEAR"),
    ("MEXICAN", "LATIN"),
    ("ATTORNEY", "Maj J. L. Ockert"),
    ("TORTLOCATION", "Colorado Springs, CO"),
]


def kernel_oracle(texts, pairs):
    rs = ReplacementSet(pairs)
    rows = []
    for t in texts:
        out, plain, err = RTFEngine(rs).run(t.encode("utf-8"))
        rows.append(
            (
                out.decode("utf-8", errors="replace"),
                plain.decode("utf-8", errors="replace"),
                err,
            )
        )
    return rows


def test_extract_fn_matches_kernel_on_synthetic():
    pdf = synthesize_transcripts_pdf(n_convs=30, turns_per_conv=4)
    fn = make_extract_fn(DEFAULT_REPLACEMENTS)
    got = fn(pdf["text"])
    want = kernel_oracle(pdf["text"], DEFAULT_REPLACEMENTS)
    for i, (o, p, e) in enumerate(want):
        assert got["rtf_out"][i] == o, f"row {i} rtf_out mismatch"
        assert got["plain_text"][i] == p, f"row {i} plain mismatch"
        assert got["error"][i] == e


def test_extract_fn_fast_path_rows():
    fn = make_extract_fn([("KEY", "VAL")])
    texts = pd.Series(
        ["plain text no markup", "", None, "has KEY inside", "tab\there\vvt\r\n"]
    )
    out = fn(texts)
    assert out["rtf_out"][0] == "plain text no markup"
    assert out["plain_text"][4] == "tab\there vt"  # \v->space, \r\n dropped
    assert out["rtf_out"][3] == "has VAL inside"
    assert out["rtf_out"][2] is None or pd.isna(out["rtf_out"][2])


@pytest.mark.spark
def test_spark_extraction_projection_golden(spark):
    rows = golden_conversations()
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    out = (
        with_rtf_extract(df, LETTER_PAIRS)
        .select("conv_id", "rtf_out", "plain_text", "error")
        .orderBy("conv_id")
        .collect()
    )
    by_conv = {r["conv_id"]: r for r in out}
    import pathlib

    ref = pathlib.Path("/root/reference/test")
    for stem in ("letter", "latepartial"):
        want = (ref / f"{stem}-correct.rtf").read_bytes().decode("utf-8", "replace")
        got = by_conv[f"golden-{stem}"]["rtf_out"]
        assert got == want, f"{stem}: Spark rtf_out != reference correct file"
        assert by_conv[f"golden-{stem}"]["error"] is None


@pytest.mark.spark
def test_spark_extraction_matches_kernel_rowwise(spark):
    pdf = synthesize_transcripts_pdf(n_convs=40, turns_per_conv=4)
    df = spark.createDataFrame(pdf)
    got = (
        with_rtf_extract(df, DEFAULT_REPLACEMENTS)
        .select("conv_id", "turn_idx", "rtf_out", "plain_text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = kernel_oracle(pdf["text"], DEFAULT_REPLACEMENTS)
    for i, (o, p, _) in enumerate(want):
        assert got["rtf_out"][i] == o
        assert got["plain_text"][i] == p


@pytest.mark.spark
def test_roundtrip_invariant_full_corpus(spark):
    # speedtest invariant over the whole synthetic corpus: no matching keys
    # -> rtf_out == text everywhere (Makefile:103)
    pdf = synthesize_transcripts_pdf(n_convs=40, turns_per_conv=3)
    df = spark.createDataFrame(pdf)
    out = with_rtf_extract(df, [("THISKEYNEVERAPPEARS", "x")])
    n_bad = out.filter("rtf_out != text OR error IS NOT NULL").count()
    assert n_bad == 0


@pytest.mark.spark
def test_single_output_udfs_match_extract(spark):
    from rtfproc_spark.functions.rtf import rtf_replace_col, rtf_strip_col

    pdf = synthesize_transcripts_pdf(n_convs=15, turns_per_conv=3)
    df = spark.createDataFrame(pdf)
    both = with_rtf_extract(df, DEFAULT_REPLACEMENTS).select(
        "conv_id", "turn_idx", "rtf_out", "plain_text"
    )
    single = df.select(
        "conv_id",
        "turn_idx",
        rtf_replace_col("text", DEFAULT_REPLACEMENTS).alias("r"),
        rtf_strip_col("text").alias("p"),
    )
    b = {(r["conv_id"], r["turn_idx"]): r["rtf_out"] for r in both.collect()}
    from rtfproc_spark.kernel import empty_replacements

    texts = {(row["conv_id"], row["turn_idx"]): row["text"] for _, row in pdf.iterrows()}
    eng = RTFEngine(empty_replacements())
    for r in single.collect():
        assert r["r"] == b[(r["conv_id"], r["turn_idx"])]
        # strip (no replacements) checked against the kernel directly
        want_p = eng.run(texts[(r["conv_id"], r["turn_idx"])].encode())[1].decode(
            "utf-8", "replace"
        )
        assert r["p"] == want_p


def test_extract_fn_differential_unicode():
    """The pandas fast-path mask must agree with the kernel on arbitrary
    text, including non-ASCII, control bytes, and markup fragments."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    pairs = [("KEY", "VAL"), ("«k»", "v"), ("A B", "x")]
    rs_fn = make_extract_fn(pairs)
    rs = ReplacementSet(pairs)

    @settings(max_examples=150, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_characters=["\udc80"]
                ),
                max_size=40,
            )
            | st.sampled_from(
                ["KEY", "«k»", "A B", r"\par x", "{KEY}", "café", "\t\v\r\n", ""]
            ),
            min_size=1,
            max_size=8,
        )
    )
    def check(texts):
        out = rs_fn(pd.Series(texts, dtype=object))
        for i, t in enumerate(texts):
            want_rtf, want_plain, want_err = RTFEngine(rs).run(t.encode("utf-8"))
            assert out["rtf_out"][i] == want_rtf.decode("utf-8", "replace"), t
            assert out["plain_text"][i] == want_plain.decode("utf-8", "replace"), t
            assert out["error"][i] == want_err

    check()


def test_registered_sql_functions_match_column_api(spark):
    """spark.sql surface: the registered rtf_* SQL functions must produce
    exactly the column API's outputs (same Arrow-batched kernels)."""
    from rtfproc_spark.functions.rtf import register_sql_functions

    pdf = synthesize_transcripts_pdf(n_convs=12, turns_per_conv=3)
    df = spark.createDataFrame(pdf)
    names = register_sql_functions(spark, DEFAULT_REPLACEMENTS, prefix="t_rtf_")
    assert names == ["t_rtf_strip", "t_rtf_replace", "t_rtf_extract"]
    df.createOrReplaceTempView("t_transcripts")
    got = {
        (r["conv_id"], r["turn_idx"]): (r["p"], r["r"], r["x"]["plain_text"])
        for r in spark.sql(
            """SELECT conv_id, turn_idx,
                      t_rtf_strip(text) AS p,
                      t_rtf_replace(text) AS r,
                      t_rtf_extract(text) AS x
               FROM t_transcripts"""
        ).collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): (r["plain_text"], r["rtf_out"])
        for r in with_rtf_extract(df, DEFAULT_REPLACEMENTS).collect()
    }
    # strip == no-replacement extraction; replace/extract use the pairs
    from rtfproc_spark.kernel import empty_replacements, RTFEngine

    eng = RTFEngine(empty_replacements())
    texts = {
        (row["conv_id"], row["turn_idx"]): row["text"] for _, row in pdf.iterrows()
    }
    for k, (p, r, xp) in got.items():
        assert r == want[k][1]
        assert xp == want[k][0]
        assert p == eng.run(texts[k].encode())[1].decode("utf-8", "replace")


def test_read_rtf_files_golden_byte_parity(spark, tmp_path):
    """The raw-file source must reproduce the reference CLI byte-for-byte:
    both golden fixtures read via binaryFile -> bytes-domain kernel UDF,
    rtf_out compared against the -correct.rtf files exactly."""
    import shutil

    from tests.test_kernel_golden import (
        LATEPARTIAL_REPLACEMENTS,
        LETTER_REPLACEMENTS,
        REF,
    )

    from rtfproc_spark.sources.rtf_files import read_rtf_files

    d = tmp_path / "rtfdir"
    d.mkdir()
    shutil.copy(REF / "letter-input.rtf", d / "letter.rtf")
    shutil.copy(REF / "latepartial-input.rtf", d / "other.txt")  # glob-pruned

    out = {
        r["path"].rsplit("/", 1)[-1]: (bytes(r["rtf_out"]), r["error"])
        for r in read_rtf_files(spark, str(d), LETTER_REPLACEMENTS).collect()
    }
    assert set(out) == {"letter.rtf"}  # *.rtf glob pruned the .txt
    want = (REF / "letter-correct.rtf").read_bytes()
    assert out["letter.rtf"] == (want, None)

    # second fixture with its own replacement set
    shutil.copy(REF / "latepartial-input.rtf", d / "late.rtf")
    out2 = {
        r["path"].rsplit("/", 1)[-1]: bytes(r["rtf_out"])
        for r in read_rtf_files(spark, str(d), LATEPARTIAL_REPLACEMENTS).collect()
    }
    assert out2["late.rtf"] == (REF / "latepartial-correct.rtf").read_bytes()


def test_stream_rtf_files_matches_batch(spark, tmp_path):
    """Raw .rtf documents arriving on a WATCHED directory, one file per
    micro-batch: the streamed extraction must byte-match the batch scan
    (and the golden fixture) for every document."""
    import os
    import shutil
    import time as _time

    from tests.test_kernel_golden import LETTER_REPLACEMENTS, REF

    from rtfproc_spark.sources.rtf_files import read_rtf_files, stream_rtf_files

    d = tmp_path / "watch"
    d.mkdir()
    now = _time.time()
    for i, stem in enumerate(("letter", "latepartial")):
        p = str(d / f"{stem}.rtf")
        shutil.copy(REF / f"{stem}-input.rtf", p)
        os.utime(p, (now + i, now + i))

    out_dir = str(tmp_path / "out")
    q = (
        stream_rtf_files(spark, str(d), LETTER_REPLACEMENTS, max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r["path"].rsplit("/", 1)[-1]: bytes(r["rtf_out"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        r["path"].rsplit("/", 1)[-1]: bytes(r["rtf_out"])
        for r in read_rtf_files(spark, str(d), LETTER_REPLACEMENTS).collect()
    }
    assert streamed == batch and set(streamed) == {"letter.rtf", "latepartial.rtf"}
    assert streamed["letter.rtf"] == (REF / "letter-correct.rtf").read_bytes()
