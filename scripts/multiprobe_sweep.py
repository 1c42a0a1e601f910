"""Multi-probe LSH operating-point sweep (VERDICT r4 #6): does
probes>1 with more planes (smaller buckets) beat the driver's
(planes=6, probes=1) point on the recall/wall frontier? The driver
query stays bit-identical — this measures alternatives.

All 2000 sf0.1 vectors serve as queries (the driver's 8-query point
gives no recall statistics); recall is against exact brute-force top-5.

Run: PYTHONPATH=/root/repo python scripts/multiprobe_sweep.py
Writes BENCH/multiprobe_r5.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
K = 5
DIM = 64
SEED = 42
GRID = [(4, 1), (6, 1), (6, 2), (6, 4), (8, 1), (8, 2), (8, 4), (10, 4)]


def main() -> int:
    from fluent_server_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )
    from fluent_server_spark.queries import load_table, spread
    from fluent_server_spark.session import get_spark

    spark = get_spark("multiprobe-sweep", cpus=32)
    emb = spread(load_table(spark, SF_DIR, "embeddings"))

    def run(df) -> float:
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    bf = brute_force_topk(emb, emb, k=K)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}

    # warm both plan shapes (probes=1 skips the explode branch)
    run(lsh_topk(emb, emb, dim=DIM, k=K, n_planes=6, seed=SEED))
    run(lsh_topk(emb, emb, dim=DIM, k=K, n_planes=6, seed=SEED, probes=2))

    points = []
    for planes, probes in GRID:
        df = lsh_topk(
            emb, emb, dim=DIM, k=K, n_planes=planes, seed=SEED, probes=probes
        )
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        recall = len(got & truth) / len(truth)
        # candidate volume = what the join actually scores (the cost
        # driver at scale); wall at sf0.1 is mostly fixed overhead
        from pyspark.sql import functions as F

        from fluent_server_spark.operators.similarity import with_lsh_bucket

        qb = with_lsh_bucket(emb, DIM, planes, SEED).groupBy("bucket").count()
        sizes = {r["bucket"]: r["count"] for r in qb.collect()}
        # probes fan out the query side: candidates ~= probes * sum(c^2)
        n_candidates = probes * sum(c * c for c in sizes.values())
        wall = min(run(df) for _ in range(2))
        points.append(
            {
                "n_planes": planes,
                "probes": probes,
                "recall_at5": round(recall, 4),
                "approx_candidates": int(n_candidates),
                "sec_best2": wall,
            }
        )
        print(json.dumps(points[-1]), flush=True)

    out = {
        "sweep": "lsh_topk multi-probe operating points, sf0.1, 2000 queries x 2000 corpus, k=5",
        "truth_pairs": len(truth),
        "driver_point": {"n_planes": 6, "probes": 1},
        "points": points,
    }
    with open("/root/repo/BENCH/multiprobe_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH/multiprobe_r5.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
