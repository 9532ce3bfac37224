"""Paired A/B of the FLAGSHIP extract path between two git trees.

BENCH_r06 showed extract_only +37% / extract_session +19% vs r5 with
ZERO kernel or flagship-path commits — almost certainly the box's
documented ±25% swing, but the headline metric deserves the same paired
treatment the cep_quantifier swing got. This script interleaves full
flagship runs (bench.py --flagship-at: full-width warmup + best-of-2
timed) from the OLD tree and the CURRENT tree, alternating
old,new,old,new within minutes of each other, so any box drift hits both
sides equally; the per-pair ratio distribution — not a single cross-day
comparison — is the verdict. Subprocesses (not in-process module
swapping) because the extraction pandas UDF executes the kernel in
WORKER processes, which import `rtfproc_spark` by name from their tree.

Both trees read the SAME staged corpus (bench.py stages it once under a
content-keyed path), so the input is byte-identical.

Usage: python benchmarks/flagship_ab.py OLD_REF [ROUNDS] [CPUS]
Prints one JSON line with per-round pairs and the median ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tarfile
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def export_tree(ref: str) -> str:
    out = tempfile.mkdtemp(prefix=f"flagship_ab_{ref[:8]}_")
    tar = os.path.join(out, "_t.tar")
    with open(tar, "wb") as f:
        subprocess.run(
            ["git", "archive", ref], cwd=REPO, stdout=f, check=True
        )
    with tarfile.open(tar) as t:
        t.extractall(out)
    os.unlink(tar)
    return out


def one_run(tree: str, cpus: int, sf_dir: str, query: str | None = None) -> dict:
    args = (
        ["--query-at", query, "--at-cpus", str(cpus)]
        if query else ["--flagship-at", str(cpus)]
    )
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(tree, "bench.py"),
            *args,
            "--sf-dir", sf_dir,
        ],
        capture_output=True,
        text=True,
        cwd=tree,
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no JSON from {tree}: {r.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    old_ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    query = sys.argv[4] if len(sys.argv) > 4 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    old_tree = export_tree(old_ref)
    if query:
        # query mode (round 8): the tree under test provides the LIBRARY
        # (rtfproc_spark + __spark_entry__); the bench harness itself is
        # held constant by copying the CURRENT bench.py into the old
        # tree — old trees predate --query-at, and an A/B should vary
        # exactly one thing (the library code)
        shutil.copy(os.path.join(REPO, "bench.py"),
                    os.path.join(old_tree, "bench.py"))
    try:
        pairs = []
        for i in range(rounds):
            old = one_run(old_tree, cpus, sf_dir, query)
            new = one_run(REPO, cpus, sf_dir, query)
            if query:
                # lower secs = faster; express as new-over-old THROUGHPUT
                # so >1 still means "new tree faster", like flagship mode
                pairs.append(
                    {
                        "round": i,
                        "old_secs": old["secs"],
                        "new_secs": new["secs"],
                        "ratio_new_over_old": round(
                            old["secs"] / new["secs"], 3
                        ),
                    }
                )
            else:
                pairs.append(
                    {
                        "round": i,
                        "old_tps": old["turns_per_sec"],
                        "new_tps": new["turns_per_sec"],
                        "ratio_new_over_old": round(
                            new["turns_per_sec"] / old["turns_per_sec"], 3
                        ),
                    }
                )
        ratios = sorted(p["ratio_new_over_old"] for p in pairs)
        median = ratios[len(ratios) // 2]
        print(
            json.dumps(
                {
                    "old_ref": old_ref,
                    "cpus": cpus,
                    "query": query,
                    "sf_dir": sf_dir,
                    "pairs": pairs,
                    "median_ratio_new_over_old": median,
                }
            )
        )
    finally:
        shutil.rmtree(old_tree, ignore_errors=True)


if __name__ == "__main__":
    main()
