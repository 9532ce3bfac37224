"""Streaming SEMANTIC (embedding-cosine) near-dedup — the embedding
analogue of the text stream's sequential near-dedup (round-8, VERDICT ask
#6). Pins: (1) the kept set equals an independent in-test implementation of
the documented SEQUENTIAL rule, (2) the library's own pure-Python
re-derivation agrees with that independent reference, (3) an availableNow
stream run and a file-by-file batch replay both reproduce it, (4) a
replayed middle batch is idempotent, (5) the degenerate-cluster cap +
null-embedding bypass semantics, and (6) index compaction with the
semantic schema changes no later decision."""

import math
import os
import time as _time

import numpy as np
import pandas as pd

DIM = 6
CENTROIDS = np.eye(3, DIM)  # c0, c1, c2 = unit axes
THRESHOLD = 0.95


def _ang(theta_deg: float, axis: int):
    """cos(theta) on x0, sin(theta) on the given axis — all cluster-0
    geometry lives on angles, so every planted cosine is an exact cos of
    an angle difference (margins >= 0.006 from the threshold)."""
    v = [0.0] * DIM
    v[0] = math.cos(math.radians(theta_deg))
    v[axis] = math.sin(math.radians(theta_deg))
    return v


def _f32(v):
    # parquet stores array<float>; the local re-derivation must see the
    # same float32-quantized values Spark casts back to double
    return [float(np.float32(x)) for x in v] if v is not None else None


FILES = [
    [
        (1, _f32([1, 0, 0, 0, 0, 0])),       # cluster 0 anchor
        (2, _f32(_ang(40, 2))),               # 40deg from id1 -> kept
        (3, _f32([0, 1, 0.05, 0, 0, 0])),     # cluster 1 -> kept
    ],
    [
        (10, _f32([1, 0, 0, 0, 0, 0])),       # exact copy of id1 -> drop
        (11, _f32(_ang(25, 3))),              # 25deg from id1 -> kept
        (12, _f32(_ang(42, 3))),              # 17deg from id11 -> drop
        (13, _f32([0.05, 0.02, 1, 0, 0, 0])),  # cluster 2 -> kept
        (14, None),                           # null embedding -> bypass
    ],
    [
        (20, _f32(_ang(5, 2))),               # 5deg from id1 -> drop
        (21, _f32([0, 0.85, 0.4, 0, 0, 0])),  # cos .925 vs id3 -> kept
        (22, _f32(_ang(59, 3))),              # 17deg from DROPPED 12,
                                              # 34deg from kept 11 -> KEPT
        (23, _f32(_ang(42, 3))),              # copy of dropped 12; 17deg
                                              # from kept 22 -> drop
        (24, _f32([0, 0, 0, 0, 1, 0.2])),     # centroid tie -> argmin
                                              # picks cluster 0; cos 0 vs
                                              # all kept -> kept
    ],
]
WANT_KEPT = [1, 2, 3, 11, 13, 14, 21, 22, 24]


def _independent_kept():
    """In-test reference: the documented sequential rule, written with
    plain numpy (margins make ulp order irrelevant here)."""
    index = []  # (cluster, vec) of kept
    kept = []
    for f in FILES:
        for i, v in sorted(f):
            if v is None:
                kept.append(i)
                continue
            x = np.asarray(v, dtype=np.float64)
            c = int(np.argmin(((CENTROIDS - x) ** 2).sum(axis=1)))
            hit = any(
                c2 == c
                and float(x @ v2) / max(np.linalg.norm(x) * np.linalg.norm(v2), 1e-12)
                >= THRESHOLD
                for c2, v2 in index
            )
            if not hit:
                kept.append(i)
                index.append((c, x))
    return kept


def _stage_files(src, files):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src.mkdir()
    now = _time.time()
    for fi, f in enumerate(files):
        tbl = pa.table(
            {
                "vec_id": pa.array([i for i, _ in f], type=pa.int64()),
                # testdata embeddings are array<float> — stage the same
                "embedding": pa.array(
                    [v for _, v in f], type=pa.list_(pa.float32())
                ),
            }
        )
        p = str(src / f"part-{fi}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (now + fi, now + fi))


def test_stream_semantic_dedup_matches_reference_and_replay(spark, tmp_path):
    from rtfproc_spark.streaming.dedup import read_kept
    from rtfproc_spark.streaming.semdedup import (
        semantic_dedup_batch_step,
        semantic_dedup_sequential_local,
        stream_semantic_dedup,
    )

    assert _independent_kept() == WANT_KEPT  # planted relations bite
    lib_kept = semantic_dedup_sequential_local(
        FILES, CENTROIDS, threshold=THRESHOLD
    )
    assert sorted(i for i, _ in lib_kept) == WANT_KEPT
    assert {bi for _, bi in lib_kept} <= {0, 1, 2}

    # --- stream run ---------------------------------------------------
    _stage_files(tmp_path / "src", FILES)
    q = stream_semantic_dedup(
        spark,
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src")),
        CENTROIDS,
        str(tmp_path / "index"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        threshold=THRESHOLD,
    )
    q.awaitTermination()
    got = sorted(
        r["vec_id"] for r in read_kept(spark, str(tmp_path / "out")).collect()
    )
    assert got == WANT_KEPT

    # --- file-by-file batch replay of the same step --------------------
    schema = "vec_id long, embedding array<float>"
    for fi, f in enumerate(FILES):
        semantic_dedup_batch_step(
            spark,
            spark.createDataFrame(
                pd.DataFrame(f, columns=["vec_id", "embedding"]), schema
            ),
            fi,
            CENTROIDS,
            str(tmp_path / "index2"),
            str(tmp_path / "out2"),
            threshold=THRESHOLD,
        )
    got2 = sorted(
        r["vec_id"] for r in read_kept(spark, str(tmp_path / "out2")).collect()
    )
    assert got2 == WANT_KEPT

    # --- replayed middle batch is idempotent ---------------------------
    semantic_dedup_batch_step(
        spark,
        spark.createDataFrame(
            pd.DataFrame(FILES[1], columns=["vec_id", "embedding"]), schema
        ),
        1,
        CENTROIDS,
        str(tmp_path / "index2"),
        str(tmp_path / "out2"),
        threshold=THRESHOLD,
    )
    got3 = sorted(
        r["vec_id"] for r in read_kept(spark, str(tmp_path / "out2")).collect()
    )
    assert got3 == WANT_KEPT


def test_stream_semantic_dedup_degenerate_cap_and_compaction(spark, tmp_path):
    """Degenerate-cluster semantics: a cluster whose index+batch population
    exceeds max_cluster admits everything and indexes nothing — so an
    exact copy of a capped-batch vector is NOT dropped later (it was never
    indexed), while below the cap dedup proceeds; compaction with the
    semantic schema changes no decision."""
    from rtfproc_spark.streaming.dedup import compact_index, read_kept
    from rtfproc_spark.streaming.semdedup import (
        SEM_INDEX_SCHEMA,
        semantic_dedup_batch_step,
        semantic_dedup_sequential_local,
    )

    files = [
        # 4 cluster-0 vectors (> max_cluster=3): two near-dup pairs, ALL
        # kept, none indexed
        [
            (1, _f32(_ang(0, 2))),
            (2, _f32(_ang(5, 2))),    # 5deg from 1 — would drop below cap
            (3, _f32(_ang(40, 2))),
            (4, _f32(_ang(45, 2))),   # 5deg from 3
        ],
        # pop = 0 (nothing indexed) + 2 <= 3: copy of batch-0 vector is
        # KEPT (no shadow from the capped batch); in-batch near-dup drops
        [
            (10, _f32(_ang(0, 2))),   # copy of 1 -> kept (1 not indexed)
            (11, _f32(_ang(4, 2))),   # 4deg from 10 -> dropped in-batch
        ],
        # index now holds batch-1's keeper (10): a copy of it drops
        [
            (20, _f32(_ang(0, 2))),   # copy of kept 10 -> dropped
            (21, _f32(_ang(70, 2))),  # far from 10 -> kept
        ],
    ]
    want = [1, 2, 3, 4, 10, 21]
    lib = semantic_dedup_sequential_local(
        files, CENTROIDS, threshold=THRESHOLD, max_cluster=3
    )
    assert sorted(i for i, _ in lib) == want

    schema = "vec_id long, embedding array<float>"
    for fi, f in enumerate(files):
        if fi == 2:
            # maintenance between committed batches: decisions unchanged
            merged = compact_index(
                spark, str(tmp_path / "index"), fi, schema=SEM_INDEX_SCHEMA
            )
            assert merged >= 0
        semantic_dedup_batch_step(
            spark,
            spark.createDataFrame(
                pd.DataFrame(f, columns=["vec_id", "embedding"]), schema
            ),
            fi,
            CENTROIDS,
            str(tmp_path / "index"),
            str(tmp_path / "out"),
            threshold=THRESHOLD,
            max_cluster=3,
        )
    got = sorted(
        r["vec_id"] for r in read_kept(spark, str(tmp_path / "out")).collect()
    )
    assert got == want
    # the capped batch indexed nothing; batch-1/2 keepers are indexed
    idx = spark.read.schema(SEM_INDEX_SCHEMA).parquet(
        str(tmp_path / "index" / "batch_id=*")
    )
    assert sorted(r["id"] for r in idx.select("id").collect()) == [10, 21]
