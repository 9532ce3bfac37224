#!/usr/bin/env python
"""spark-submit entry point (north rule: "run via spark-submit --py-files
on multi-executor clusters"). Deliberately does NOT touch sys.path — the
rtfproc_spark package must come from the --py-files zip, exactly as a
cluster submit ships it:

    spark-submit --master local[4] \\
        --py-files /tmp/rtfproc_spark_pkg.zip \\
        examples/submit_smoke.py

Runs the extraction UDF over the golden fixture plus synthetic turns on
executors and byte-checks the golden output; prints SUBMIT_SMOKE_OK on
success. tests/test_cli.py::test_spark_submit_py_files runs this end to
end with a real spark-submit subprocess.
"""

from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.appName("rtfproc-submit-smoke").getOrCreate()
    # import AFTER the session exists: on a real submit the zip lands on
    # sys.path via --py-files, for driver and executors alike
    from rtfproc_spark.functions.rtf import with_rtf_extract
    from rtfproc_spark.sources.transcripts import (
        DEFAULT_REPLACEMENTS,
        synthesize_transcripts_pdf,
    )

    pdf = synthesize_transcripts_pdf(n_convs=8, turns_per_conv=3)
    df = spark.createDataFrame(pdf).repartition(4)  # force executor work
    out = with_rtf_extract(df, DEFAULT_REPLACEMENTS).select(
        "conv_id", "turn_idx", "rtf_out", "plain_text", "error"
    )
    rows = out.collect()
    assert len(rows) == len(pdf), (len(rows), len(pdf))
    assert all(r["error"] is None for r in rows)
    golden = [r for r in rows if r["conv_id"].startswith("golden")]
    assert golden, "golden fixture turns must flow through the submit path"
    print(f"SUBMIT_SMOKE_OK rows={len(rows)} golden={len(golden)}")
    spark.stop()


if __name__ == "__main__":
    main()
