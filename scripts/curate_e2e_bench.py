"""End-to-end --curate chain wall at bench scale (VERDICT r5 #4).

Synthesizes a 5M-doc corpus (deterministic: the synth turns generator's
text stream with xxhash64 doc ids, 'en' lang), then runs the EXACT
composition `python -m fluent_server_spark --curate` executes —
exact dedup -> minhash LSH near-dup clustering (connected components) ->
perplexity band -> deterministic split + partitioned write — timing each
stage's materialization and recording survivor counts. Writes
BENCH/curate_e2e_r6.json with per-stage walls and a docs/sec headline
for the full chain.

Run: PYTHONPATH=/root/repo python scripts/curate_e2e_bench.py \
         [--rows 5000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--work", default=os.environ.get("BENCH_WORK", "/dev/shm"))
    ap.add_argument("--json-out", default=os.path.join(REPO, "BENCH", "curate_e2e_r6.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fluent_server_spark.data.synth import synth_turns_spark
    from fluent_server_spark.operators.dedup import (
        connected_components,
        dedup_keep_first,
        minhash_lsh_pairs,
    )
    from fluent_server_spark.operators.lm_quality import perplexity_band_filter
    from fluent_server_spark.operators.sampling import sample_hash
    from fluent_server_spark.session import get_spark

    spark = get_spark(
        "fss-curate-e2e",
        cpus=args.cpus,
        shuffle_partitions=2 * args.cpus,
        extra_conf={
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={args.cpus}",
            "spark.sql.files.maxPartitionBytes": "16m",
        },
    )

    src = os.path.join(args.work, f"fss-docs-{args.rows}.parquet")
    if not os.path.exists(src):
        turns = synth_turns_spark(
            spark, args.rows, n_convs=max(args.rows // 100, 1),
            partitions=max(64, args.rows // 500_000),
        )
        (
            turns.select(
                F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
                F.col("text"),
                F.lit("en").alias("lang"),
                F.element_at(
                    F.array(F.lit("src0"), F.lit("src1"), F.lit("src2")),
                    (F.pmod(F.xxhash64("conv_id"), F.lit(3)) + 1).cast("int"),
                ).alias("source"),
                F.length("text").alias("n_chars"),
            )
            .write.mode("overwrite")
            .parquet(src)
        )
    out_dir = tempfile.mkdtemp(prefix="fss-curate-e2e-", dir=args.work)
    walls: dict[str, float] = {}
    stages: dict[str, int] = {}
    t_all = time.time()
    try:
        docs = spark.read.parquet(src)
        spark.sparkContext.setJobDescription("curate: input count")
        t0 = time.time()
        stages["input"] = docs.count()
        walls["input_count"] = round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription("curate: exact dedup")
        t0 = time.time()
        docs = dedup_keep_first(docs).localCheckpoint(eager=True)
        stages["exact_dedup"] = docs.count()
        walls["exact_dedup"] = round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription("curate: neardup pairs+components")
        t0 = time.time()
        pairs = minhash_lsh_pairs(docs, threshold=0.2, max_bucket_size=200)
        comp = connected_components(pairs)
        drop = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        docs = docs.join(drop, "doc_id", "left_anti").localCheckpoint(eager=True)
        stages["neardup_cluster_dedup"] = docs.count()
        walls["neardup_cluster_dedup"] = round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription("curate: perplexity band")
        t0 = time.time()
        docs = perplexity_band_filter(docs).localCheckpoint(eager=True)
        stages["quality_band"] = docs.count()
        walls["quality_band"] = round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription("curate: split + write")
        t0 = time.time()
        h = sample_hash(F.col("doc_id"), "curate-split")
        out = docs.withColumn(
            "split",
            F.when(h < 900_000, "train").when(h < 950_000, "val").otherwise("test"),
        )
        out.write.mode("overwrite").partitionBy("split").parquet(
            f"{out_dir}/documents"
        )
        walls["split_write"] = round(time.time() - t0, 3)
        total = round(time.time() - t_all, 3)
        result = {
            "rows": args.rows,
            "cpus": args.cpus,
            "params": {"dedup_threshold": 0.2, "max_bucket_size": 200},
            "stage_walls_sec": walls,
            "stage_survivors": stages,
            "total_wall_sec": total,
            "docs_per_sec": round(args.rows / total, 1),
        }
        os.makedirs(os.path.dirname(args.json_out), exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
        return 0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
