"""SemDeDup data-scale probe: does throughput hold when the corpus grows
1x -> 4x -> 8x AND the coarse quantizer grows with it?

SemDeDup's cost model is sum_c m_c^2 ~= n^2 / nlist: at FIXED nlist the
work is quadratic in corpus size (the degenerate regime the max_cluster
cap guards), while the published posture (50k clusters for LAION) scales
nlist with n to hold per-cluster size — and with it per-task work and
memory — constant. This probe measures BOTH columns so the knob's effect
is data, not doctrine:

- scaled nlist = 16 * mult  -> rows/sec should hold or rise;
- fixed  nlist = 16         -> rows/sec should fall roughly linearly
  (total time quadratic), demonstrating why the knob exists.

Replicas are deterministically MUTATED (per-replica component rotation +
id offset): rotation preserves norms and within-replica geometry, so each
replica carries the same near-dup structure, while cross-replica cosine
relations change — corpus shape stays realistic instead of 8 identical
copies collapsing into one giant component.

Writes BENCH/SEMDEDUP_SCALE.md. Run on an idle box:
    python benchmarks/semdedup_scale_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

BENCH_BASE = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/rtfproc_bench")
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def scaled_embeddings(mult: int) -> str:
    path = os.path.join(BENCH_BASE, f"semdedup_x{mult}.parquet")
    if os.path.exists(path):
        return path
    base = pd.read_parquet(os.path.join(SRC, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])
    X = np.stack([np.asarray(v, dtype=np.float32) for v in base["embedding"]])
    parts = []
    for r in range(mult):
        Xr = np.roll(X, 5 * r, axis=1) if r else X
        parts.append(pd.DataFrame({
            "vec_id": base["vec_id"].to_numpy() + r * 10_000_000,
            "embedding": list(Xr),
        }))
    pd.concat(parts, ignore_index=True).to_parquet(path, index=False)
    return path


def main() -> None:
    from rtfproc_spark.functions.similarity import kmeans_fit_local, semantic_dedup
    from rtfproc_spark.session import get_spark

    spark = get_spark("semdedup-scale", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    entry_mod._ensure_pkg_on_executors(spark)

    rows = []
    for mult in (1, 4, 8):
        path = scaled_embeddings(mult)
        local = pd.read_parquet(path)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in local["embedding"]])
        n = len(X)
        for label, nlist in (("scaled", 16 * mult), ("fixed", 16)):
            C = kmeans_fit_local(X, nlist=nlist, seed=42)
            df = spark.read.parquet(path)
            # warm once at 1x so JVM/UDF costs don't land on the first row
            if mult == 1 and label == "scaled" and not rows:
                semantic_dedup(df, C, threshold=0.35).count()
            t0 = time.time()
            kept = (
                semantic_dedup(df, C, threshold=0.35)
                .filter("keep").count()
            )
            dt = time.time() - t0
            rows.append((mult, label, nlist, n, kept, round(dt, 2),
                         int(n / dt)))
            print(f"x{mult} {label:6s} nlist={nlist:4d} n={n} kept={kept} "
                  f"{dt:6.2f}s {int(n / dt)} rows/s", flush=True)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SEMDEDUP_SCALE.md", "w") as f:
        f.write("# SemDeDup data-scale probe\n\n")
        f.write(__doc__.split("Writes BENCH/")[0] + "\n")
        f.write("| corpus | nlist policy | nlist | rows | kept | secs | rows/sec |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for mult, label, nlist, n, kept, dt, rps in rows:
            f.write(f"| x{mult} | {label} | {nlist} | {n} | {kept} | {dt} | {rps} |\n")
        f.write(f"\nMeasured on local[{CPUS}], source {SRC}. Mutated-replica "
                "construction documented in the module docstring.\n")
    print("wrote BENCH/SEMDEDUP_SCALE.md")


if __name__ == "__main__":
    main()
