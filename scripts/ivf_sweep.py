"""IVF trainer recall sweep (VERDICT r4 #7): real k-means centroids
(not the driver's deterministic oracle seeds), k_cells x nprobe grid at
sf0.1 — so the "nprobe trades recall for cells scanned" guidance
carries numbers. All 2000 vectors serve as queries; recall@5 is
against exact brute force.

Run: PYTHONPATH=/root/repo python scripts/ivf_sweep.py
Writes BENCH/ivf_sweep_r5.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
K = 5
DIM = 64
GRID = [(8, 1), (8, 2), (8, 4), (8, 8), (16, 1), (16, 2), (16, 4), (32, 2), (32, 4), (32, 8)]


def main() -> int:
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.ivf import (
        assign_cells,
        ivf_topk,
        train_centroids,
    )
    from fluent_server_spark.operators.similarity import brute_force_topk
    from fluent_server_spark.queries import load_table, spread
    from fluent_server_spark.session import get_spark

    spark = get_spark("ivf-sweep", cpus=32)
    emb = spread(load_table(spark, SF_DIR, "embeddings"))
    n_corpus = emb.count()

    def run(df) -> float:
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, emb, k=K).collect()
    }

    cents = {}
    train_secs = {}
    for k_cells in sorted({g[0] for g in GRID}):
        t0 = time.time()
        cents[k_cells] = train_centroids(emb, k_cells, DIM, total_rows=n_corpus)
        train_secs[k_cells] = round(time.time() - t0, 3)

    run(ivf_topk(emb, emb, cents[8], k=K, nprobe=2))  # warm the plan shape

    points = []
    for k_cells, nprobe in GRID:
        df = ivf_topk(emb, emb, cents[k_cells], k=K, nprobe=nprobe)
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        recall = len(got & truth) / len(truth)
        # expected corpus fraction scanned per query: mean over queries
        # of (size of their nprobe probed cells) / N — the cost dial
        sizes = {
            r["cell"]: r["n"]
            for r in assign_cells(emb, cents[k_cells])
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # approximate with the nprobe largest-cell upper and uniform
        # lower bound by just reporting the mean probed fraction as
        # nprobe/k_cells alongside the cell-size skew
        skew = max(sizes.values()) / (n_corpus / len(sizes))
        wall = min(run(df) for _ in range(2))
        points.append(
            {
                "k_cells": k_cells,
                "nprobe": nprobe,
                "recall_at5": round(recall, 4),
                "nominal_fraction_scanned": round(nprobe / k_cells, 4),
                "cell_skew_maxcell_over_mean": round(skew, 2),
                "sec_best2": wall,
            }
        )
        print(json.dumps(points[-1]), flush=True)

    out = {
        "sweep": "ivf_topk trained-centroid grid, sf0.1, 2000 queries x 2000 corpus, k=5",
        "truth_pairs": len(truth),
        "train_secs": train_secs,
        "points": points,
    }
    with open("/root/repo/BENCH/ivf_sweep_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH/ivf_sweep_r5.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
