"""Corpus-size sweep for substring-level exact dedup (VERDICT r4 #5):
pin the O(total chars) scaling claim empirically, and measure the
winnowing-fingerprint approximation path (the published mitigation for
when stride-1 is too hot) against the exact path at each size.

Run: PYTHONPATH=/root/repo python scripts/substring_sweep.py
Writes BENCH/substring_sweep_r5.json. Do not run other Spark jobs
concurrently (same rule as scaling_bench).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
SIZES = [625, 1250, 2500, 5000]
K, W = 20, 8


def main() -> int:
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.substring_dedup import (
        dedup_substrings,
        gram_positions,
        winnowed_gram_positions,
    )
    from fluent_server_spark.queries import load_table, spread
    from fluent_server_spark.session import get_spark

    spark = get_spark("substring-sweep", cpus=32)
    docs_all = load_table(spark, SF_DIR, "documents")

    def corpus(n: int):
        return spread(docs_all.filter(F.col("doc_id") < n))

    def run(df) -> float:
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    # JVM/codegen warmup on the smallest size, both variants (first-use
    # JIT would otherwise pollute the first point — see BENCH notes)
    run(dedup_substrings(corpus(SIZES[0]), k=K))
    run(dedup_substrings(corpus(SIZES[0]), k=K, winnow_w=W))

    points = []
    for n in SIZES:
        docs = corpus(n)
        chars, removed_exact = (
            dedup_substrings(docs, k=K)
            .agg(
                F.sum(F.length("text")).alias("chars"),
                F.sum("n_removed_chars").alias("rm"),
            )
            .collect()[0]
        )
        removed_winnow = (
            dedup_substrings(docs, k=K, winnow_w=W)
            .agg(F.sum("n_removed_chars"))
            .collect()[0][0]
        )
        fp_exact = gram_positions(docs, k=K).count()
        fp_winnow = winnowed_gram_positions(docs, k=K, w=W).count()
        # interleaved best-of-2 per variant (ambient-noise insurance)
        t_exact = min(run(dedup_substrings(docs, k=K)) for _ in range(2))
        t_winnow = min(
            run(dedup_substrings(docs, k=K, winnow_w=W)) for _ in range(2)
        )
        points.append(
            {
                "n_docs": n,
                "total_chars": int(chars),
                "fingerprints_exact": int(fp_exact),
                "fingerprints_winnowed": int(fp_winnow),
                "fp_density_ratio": round(fp_winnow / fp_exact, 4),
                "removed_chars_exact": int(removed_exact),
                "removed_chars_winnowed": int(removed_winnow),
                "winnow_removal_recall": round(removed_winnow / removed_exact, 4)
                if removed_exact
                else None,
                "sec_exact_best2": t_exact,
                "sec_winnowed_best2": t_winnow,
            }
        )
        print(json.dumps(points[-1]), flush=True)

    # the sf0.1 table tops out at 1.5M chars, where wall is fixed-
    # overhead-bound (the r4 jaccard sweep hit the same wall). To expose
    # the asymptotic regime, add SYNTHETIC corpora: ~1KB docs of
    # deterministic md5-chain text (unique per doc), 1 doc in 10
    # carrying a fixed 200-char boilerplate tail — so duplication is
    # controlled and total chars scale 5M -> 40M.
    boiler = "B" * 200
    synth_points = []

    def synth(n_docs: int):
        base = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(0), F.lit(30)),
                    lambda j: F.md5(
                        F.concat_ws(":", F.col("id").cast("string"), j.cast("string"))
                    ),
                ),
            ).alias("body"),
        )
        return base.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 0, F.concat("body", F.lit(boiler))
            )
            .otherwise(F.col("body"))
            .alias("text"),
        )

    run(dedup_substrings(synth(1000), k=K))  # warm the synth plan shape
    run(dedup_substrings(synth(1000), k=K, winnow_w=W))
    for n in [5_000, 10_000, 20_000, 40_000]:
        docs = synth(n)
        chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
        t_exact = min(run(dedup_substrings(docs, k=K)) for _ in range(2))
        t_winnow = min(
            run(dedup_substrings(docs, k=K, winnow_w=W)) for _ in range(2)
        )
        synth_points.append(
            {
                "n_docs": n,
                "total_chars": int(chars),
                "sec_exact_best2": t_exact,
                "sec_winnowed_best2": t_winnow,
            }
        )
        print(json.dumps(synth_points[-1]), flush=True)

    base = points[0]
    out = {
        "sweep": "substring_dedup corpus-size, sf0.1 documents prefix slices",
        "k": K,
        "winnow_w": W,
        "cpus": 32,
        "points": points,
        # wall vs chars, normalized to the smallest size: ~1.0 slope
        # means O(total chars); <1 means fixed-overhead-bound
        "scaling_exponent_exact": round(
            _loglog_slope(
                [(p["total_chars"], p["sec_exact_best2"]) for p in points]
            ),
            3,
        ),
        "scaling_exponent_winnowed": round(
            _loglog_slope(
                [(p["total_chars"], p["sec_winnowed_best2"]) for p in points]
            ),
            3,
        ),
        "base_point": base["n_docs"],
        "synthetic_points": synth_points,
        "synthetic_scaling_exponent_exact": round(
            _loglog_slope(
                [(p["total_chars"], p["sec_exact_best2"]) for p in synth_points]
            ),
            3,
        ),
        "synthetic_scaling_exponent_winnowed": round(
            _loglog_slope(
                [
                    (p["total_chars"], p["sec_winnowed_best2"])
                    for p in synth_points
                ]
            ),
            3,
        ),
    }
    with open("/root/repo/BENCH/substring_sweep_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH/substring_sweep_r5.json")
    return 0


def _loglog_slope(pairs: list[tuple[int, float]]) -> float:
    import math

    xs = [math.log(x) for x, _ in pairs]
    ys = [math.log(y) for _, y in pairs]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


if __name__ == "__main__":
    raise SystemExit(main())
