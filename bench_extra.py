"""Per-query measurement harness for optimization rounds (guide §1).

bench.py is FROZEN for driver measurement; this file is the working
instrument: it times any subset of the headline queries in isolation via
the noop sink (so the computation is measured, not the sink), labels
each job, records best-of-N walls plus a calibration probe per query
(the §1 'ambient conditions' stamp), and can dump .explain("formatted")
per query for the plans/r06/ evidence files.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 --repeats 2 \
      --queries embedding_neardup_lsh,semdedup_drop \
      --json-out BENCH/r6_probe.json --explain-dir plans/r06 --explain-suffix _after
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _burn(k: int) -> int:
    x = 0
    for i in range(k):
        x += i * i
    return x


def calibration_probe() -> float:
    t0 = time.time()
    with mp.Pool(8) as p:
        p.map(_burn, [4_000_000] * 8)
    return round(8 * 4_000_000 / (time.time() - t0) / 1e6, 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")  # comma list; empty = all headline
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--warm-sf", default="/root/testdata/sf0.001")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--json-out", default="")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--explain-suffix", default="")
    ap.add_argument("--per-query-cal", action="store_true")
    args = ap.parse_args()

    from bench import HEADLINE_QUERIES
    from fluent_server_spark.queries import all_queries
    from fluent_server_spark.session import get_spark

    names = [q for q in args.queries.split(",") if q] or list(HEADLINE_QUERIES)
    specs = all_queries()

    spark = get_spark(
        "fss-bench-extra",
        cpus=args.cpus,
        shuffle_partitions=2 * args.cpus,
        extra_conf={
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={args.cpus}",
            "spark.sql.files.maxPartitionBytes": "16m",
        },
    )

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            df = specs[name].fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(
                os.path.join(args.explain_dir, f"{name}{args.explain_suffix}.txt"), "w"
            ) as f:
                f.write(f"-- {name} @ {args.sf_dir}\n{plan}")

    out: dict = {
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "repeats": args.repeats,
        "cal_start": calibration_probe(),
        "queries": {},
        "samples": {},
        "cal": {},
    }
    if args.repeats <= 0:
        print(json.dumps(out))
        return 0
    if not args.no_warm:
        for name in names:
            try:
                spark.sparkContext.setJobDescription(f"warm:{name}")
                specs[name].fn(spark, args.warm_sf).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception as e:  # warmup best-effort
                print(f"warm {name}: {e}", file=sys.stderr)
    for name in names:
        walls = []
        for r in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench:{name}:{r}")
            t0 = time.time()
            specs[name].fn(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            walls.append(round(time.time() - t0, 3))
        out["queries"][name] = min(walls)
        out["samples"][name] = walls
        if args.per_query_cal:
            out["cal"][name] = calibration_probe()
        print(f"{name}: {min(walls)} {walls}", file=sys.stderr)
    out["cal_end"] = calibration_probe()
    out["total"] = round(sum(out["queries"].values()), 3)
    print(json.dumps(out))
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
