"""Isolation re-measure protocol (BENCH/BASELINE.md r5 finding):
full-bench per-query walls carry up to ~1.8x in-run pressure noise from
neighboring queries even at matched calibration. This script re-times
each headline query in a FRESH JVM (one subprocess per query, warmup at
sf0.001 then best-of-N at the target sf) so cross-round comparisons can
separate "the code got slower" from "the run was crowded".

Run: PYTHONPATH=/root/repo python scripts/isolation_bench.py \
        [--min-wall 1.0] [--repeats 3] [--out BENCH/isolation_rN.json]
Only queries whose latest full-bench wall exceeded --min-wall are
re-measured (the cheap ones are overhead-dominated either way).
Do not run other Spark jobs concurrently.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

WORKER = r"""
import sys, time
sys.path.insert(0, "/root/repo")
from fluent_server_spark.session import get_spark
from fluent_server_spark.queries import all_queries

name, sf_dir, repeats = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark("isolate-" + name, cpus=32)
fn = all_queries()[name].fn
fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
walls = []
for _ in range(repeats):
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    walls.append(round(time.time() - t0, 3))
print("ISOLATED " + repr(walls))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--min-wall", type=float, default=1.0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--bench-json", default=None,
                    help="full-bench queries dict to pick outliers from "
                         "(default: run bench.py query list with no filter)")
    ap.add_argument("--out", default="/root/repo/BENCH/isolation_r5.json")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import bench

    if args.bench_json:
        walls = json.load(open(args.bench_json))["queries"]
        names = [n for n, w in walls.items() if w >= args.min_wall]
        in_run = {n: walls[n] for n in names}
    else:
        names = list(bench.HEADLINE_QUERIES)
        in_run = {}

    results = {}
    for name in names:
        proc = subprocess.run(
            [sys.executable, "-c", WORKER, name, args.sf_dir,
             str(args.repeats)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("ISOLATED")]
        if proc.returncode != 0 or not line:
            results[name] = {"error": proc.stderr[-500:]}
            print(f"FAIL {name}", file=sys.stderr)
            continue
        walls = eval(line[0].split(" ", 1)[1])
        results[name] = {
            "walls": walls,
            "best": min(walls),
            "in_run": in_run.get(name),
        }
        print(name, results[name])

    out = {
        "sf_dir": args.sf_dir,
        "repeats": args.repeats,
        "protocol": (
            "fresh JVM per query, warmup at sf0.001, best-of-N at target "
            "sf; compare `best` across rounds, not in-run walls"
        ),
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("written", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
