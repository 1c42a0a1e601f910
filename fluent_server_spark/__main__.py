"""spark-submit entry point.

    spark-submit --py-files fluent_server_spark.zip \
        -m fluent_server_spark  # or: python -m fluent_server_spark
        --source parquet --input s3://bucket/turns/ \
        --sinks s3://bucket/sinks --checkpoint /mnt/ckpt/run1.jsonl \
        --groups 256 --buckets 65536 --salt 64 --run-id prod-2026-08-16

On a cluster the config mirrors the reference's env-var config surface
(reference: main.go:21-58) as explicit flags. Re-running with the same
--run-id and --checkpoint resumes from the last acked group.
"""

from __future__ import annotations

import argparse
import json
import sys

from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline
from fluent_server_spark.session import get_spark
from fluent_server_spark.sources import load_turns


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fluent_server_spark")
    ap.add_argument("--source", default="parquet", help="parquet|csv|json|iceberg|synthetic")
    ap.add_argument("--input", required=True, help="table/dir location, or N[:convs] for synthetic")
    ap.add_argument("--sinks", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--groups", type=int, default=1)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--parse-impl", default="native", choices=["native", "pandas"])
    ap.add_argument("--cpus", type=int, default=None, help="local mode only")
    args = ap.parse_args(argv)

    spark = get_spark("fluent_server_spark", cpus=args.cpus)
    turns = load_turns(spark, args.source, args.input)
    cfg = PipelineConfig(
        sinks_path=args.sinks,
        checkpoint_path=args.checkpoint,
        parse_impl=args.parse_impl,
        n_buckets=args.buckets,
        n_salt=args.salt,
        checkpoint_groups=args.groups,
    )
    pipe = TranscriptPipeline(spark, cfg)
    run_id = pipe.run(turns, run_id=args.run_id)
    counts = {
        r["sink"]: r["n_turns"]
        for r in pipe.aggregates()["routed_counts"].collect()
    }
    print(json.dumps({"run_id": run_id, "routed_counts": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
