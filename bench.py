"""Benchmark harness — the driver runs this per-round (BENCH_r{N}.json).

Measures (1) headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], each fully materialized via the noop sink, and
(2) the flagship end-to-end pipeline over a pre-materialized synthetic
turns parquet table (read -> vectorized parse -> broadcast enrich ->
first-match route -> partitioned parquet sinks + checkpoint commit) as
parsed+routed turns/sec — the BASELINE.json metric. Input
materialization is NOT timed: the metric is defined over a stored
transcript table, matching the 10^12-turn Iceberg design point.

Scale-honesty knobs (see BENCH/BASELINE.md):
* scan splits sized to cores (`spark.sql.files.maxPartitionBytes`) —
  the 128 MB default packs a small local table into ~5 splits and
  silently caps parallelism;
* `-XX:ActiveProcessorCount` pinned to the requested cores so a
  local[4] JVM cannot borrow the other 28 cores for GC/JIT;
* work dir defaults to tmpfs ($BENCH_WORK or /dev/shm) — on a real
  cluster storage bandwidth scales with executors; a single local disk
  would serialize the sink write and measure the disk, not the engine.

Prints ONE JSON line:
  {"metric": ..., "value": <total query sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "pipeline": {...}}

Usage: python bench.py [--cpus N] [--rows N] [--skip-queries] [--sf-dir D]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_QUERIES = [
    "route_events",
    "routed_event_counts",  # r3: now also carries the per-type histogram grain
    "user_session_stats",  # r3: now also carries the native session_window agg
    "top3_events_per_type",
    "hourly_event_rollup",  # r3: now also carries the rolling RANGE frame
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "supplier_part_rollup",
    "exact_dedup_docs",
    # r5: text stats + lang-id + winnowing fingerprints merged into the
    # single-scan doc_profile
    "doc_profile",
    "minhash_neardup_pairs",
    "simhash_neardup_pairs",
    # r4: exact jaccard joined the headline set once the threshold-aware
    # count kernel made it bench-shaped (1.4s at sf0.1, was 9.5s)
    "ngram_jaccard_pairs",
    # embedding_neardup_pairs (exact O(n^2) cross join) is deliberately
    # NOT benched: it is the sf0.01 oracle anchor only. The benched
    # near-dup headline is the LSH scale path, same for ANN.
    "embedding_neardup_lsh",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "decontaminate_docs",
    "packed_training_chunks",
    "tfidf_top_terms",
    "pii_scrub_stats",
    "doc_chunk_stats",
    # r5: funnel + heavy-hitters merged into user_journey (per-user
    # grain), and the two operators promoted to the driver surface
    # joined the headline set
    "user_journey",
    "substring_dedup",
    "perplexity_band",
    # r5: the semantic-dedup and lexical-retrieval additions
    "semdedup_drop",
    "bm25_topk",
    "event_cube_stats",
    "user_value_deciles",
    "event_window_stats",
    "event_props_stats",
    "fuzzy_neardup_pairs",
]

PIPELINE_ROWS_DEFAULT = 5_000_000

# pressure-honesty reference (BENCH/BASELINE.md r5 finding: in-run
# walls carry up to ~1.8x neighbor pressure at matched calibration).
# expected_walls.json records each query's best known steady-state wall
# (full-bench records + the fresh-JVM isolation protocol); queries
# measuring > OUTLIER_RATIO x expected (and >= OUTLIER_FLOOR s absolute,
# below which overhead dominates) get ONE targeted extra run, and
# whatever still exceeds the band is reported as a pressure outlier so
# cross-round readers can separate "slower code" from "crowded run".
EXPECTED_WALLS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH", "expected_walls.json"
)
OUTLIER_RATIO, OUTLIER_FLOOR = 1.5, 1.0


def default_work_dir() -> str:
    env = os.environ.get("BENCH_WORK")
    if env:
        return env
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def time_query(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 3)


def materialize_turns(spark, work_root: str, n_rows: int, n_convs: int) -> str:
    """Write (once, untimed) the synthetic turns table the bench reads."""
    from fluent_server_spark.data.synth import synth_turns_spark

    src = os.path.join(work_root, f"fss-turns-{n_rows}-{n_convs}.parquet")
    if not os.path.exists(src):
        synth_turns_spark(
            spark, n_rows, n_convs=n_convs, partitions=max(64, n_rows // 500_000)
        ).write.mode("overwrite").parquet(src)
    return src


def run_pipeline_bench(
    spark, n_rows: int, n_convs: int, work_root: str, variants: bool = True
) -> dict:
    from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline

    src = materialize_turns(spark, work_root, n_rows, n_convs)
    turns = spark.read.parquet(src)
    work = tempfile.mkdtemp(prefix="fss-bench-", dir=work_root)
    try:
        lean = os.environ.get("SPARK_GRAFT_SINK_VARIANT") == "lean"
        cfg = PipelineConfig(
            sinks_path=f"{work}/sinks",
            checkpoint_path=f"{work}/ckpt.jsonl",
            parse_impl="native",
            n_buckets=64,
            n_salt=8,
            checkpoint_groups=1,
            codec="snappy",  # bench: cheapest CPU; zstd is the at-rest default
            # lean sink variant (scaling experiments): drop the msg column
            # (re-extractable from text) and dictionary pages
            sink_drop_cols=("msg",) if lean else (),
            parquet_dictionary=not lean,
        )
        pipe = TranscriptPipeline(spark, cfg)
        # JIT warmup on a 4%-size slice of the same table shape: the
        # first-ever execution of the write path pays codegen + parquet
        # writer class loading (measured 22s -> 7s -> 5.5s across three
        # identical runs in a fresh JVM). Without this, the base variant
        # was billed the JIT while the lean variant (always run later,
        # warm) looked 2x faster — an ordering artifact, not a schema
        # effect.
        warm_src = materialize_turns(spark, work_root, max(n_rows // 25, 1), max(n_convs // 25, 1))
        warm = spark.read.parquet(warm_src)
        pipe.run(warm, run_id="warmup")
        # best-of-3 (fresh run_id each time so nothing is skipped as
        # acked): single runs swing up to 3x with host steal, and steal
        # bursts last minutes — two adjacent runs can BOTH land in one
        # (observed: 35.6 s and a 2.6 s noop in the same bench invocation)
        wall = float("inf")
        for attempt in ("bench", "bench2", "bench3"):
            t0 = time.time()
            pipe.run(turns, run_id=attempt)
            wall = min(wall, time.time() - t0)
        base = {
            "rows": n_rows,
            "wall_sec": round(wall, 3),
            "turns_per_sec": round(n_rows / wall, 1),
        }
        if not variants:
            return base
        # lean sink variant (msg pruned + dictionary off): the measured
        # +10-15% write-stage lever from BENCH/BASELINE.md, reported
        # alongside the contract-schema number every round
        cfg_l = PipelineConfig(
            sinks_path=f"{work}/sinks-lean",
            checkpoint_path=f"{work}/ckpt-lean.jsonl",
            parse_impl="native",
            n_buckets=64,
            n_salt=8,
            codec="snappy",
            sink_drop_cols=("msg",),
            parquet_dictionary=False,
        )
        pipe_l = TranscriptPipeline(spark, cfg_l)
        wall_lean = float("inf")
        for attempt in ("bench-lean", "bench-lean2"):
            t3 = time.time()
            pipe_l.run(turns, run_id=attempt)
            wall_lean = min(wall_lean, time.time() - t3)
        base["lean_wall_sec"] = round(wall_lean, 3)
        base["lean_turns_per_sec"] = round(n_rows / wall_lean, 1)
        cfg_p = PipelineConfig(
            sinks_path=f"{work}/sinks2",
            checkpoint_path=f"{work}/ckpt2.jsonl",
            parse_impl="pandas",
        )
        pipe_p = TranscriptPipeline(spark, cfg_p)
        # Warm BOTH transform paths on the small slice before timing. The
        # native path is already warm (the pipeline runs above use it) but
        # the pandas path's first execution pays Python-worker spawn +
        # Arrow serializer setup — BENCH_r03.json recorded 17.9s for it
        # unwarmed vs ~3.3s warmed, a 4x first-use artifact, while the
        # native noop (warm) read 2.6s. Then interleave best-of-2 so a
        # host-steal burst cannot bill one variant only.
        pipe_p.transform(warm).write.mode("overwrite").format("noop").save()
        pipe.transform(warm).write.mode("overwrite").format("noop").save()
        wall_pandas = wall_native_noop = float("inf")
        for _ in range(2):
            t1 = time.time()
            pipe_p.transform(turns).write.mode("overwrite").format("noop").save()
            wall_pandas = min(wall_pandas, time.time() - t1)
            t2 = time.time()
            pipe.transform(turns).write.mode("overwrite").format("noop").save()
            wall_native_noop = min(wall_native_noop, time.time() - t2)
        return {
            **base,
            "noop_native_sec": round(wall_native_noop, 3),
            "noop_native_turns_per_sec": round(n_rows / wall_native_noop, 1),
            "noop_pandas_parse_sec": round(wall_pandas, 3),
            "noop_pandas_parse_turns_per_sec": round(n_rows / wall_pandas, 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _burn(k: int) -> int:
    x = 0
    for i in range(k):
        x += i * i
    return x


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--rows", type=int, default=PIPELINE_ROWS_DEFAULT)
    ap.add_argument("--convs", type=int, default=50_000)
    ap.add_argument("--skip-queries", action="store_true")
    ap.add_argument("--skip-pipeline", action="store_true")
    ap.add_argument("--no-variants", action="store_true")
    ap.add_argument("--work-dir", default=default_work_dir())
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from fluent_server_spark.queries import all_queries
    from fluent_server_spark.session import get_spark

    spark = get_spark(
        "fss-bench",
        cpus=args.cpus,
        shuffle_partitions=2 * args.cpus,  # over-partition: smaller sort/write tasks, no spill
        extra_conf={
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={args.cpus}",
            "spark.sql.files.maxPartitionBytes": "16m",
        },
    )

    queries: dict[str, float] = {}
    if not args.skip_queries:
        specs = all_queries()
        # JIT warmup: run every headline once at the smallest sf first —
        # the first execution of a plan pays codegen/JIT compilation
        # (measured up to 2x on the array-heavy LSH kernels); the
        # recorded number should measure the engine, not the compiler.
        for name in HEADLINE_QUERIES:
            try:
                time_query(spark, specs[name].fn, "/root/testdata/sf0.001")
            except Exception:
                pass  # warmup is best-effort; the measured run reports errors
        # best-of-2: host CPU steal in this shared microVM swings single
        # runs up to 3x on minute scales (measured — see BENCH/BASELINE.md);
        # the min of two spaced runs is the steady-state estimate
        for name in HEADLINE_QUERIES:
            queries[name] = time_query(spark, specs[name].fn, args.sf_dir)
        for name in HEADLINE_QUERIES:
            queries[name] = min(
                queries[name], time_query(spark, specs[name].fn, args.sf_dir)
            )

    expected: dict[str, float] = {}
    pressure_outliers: dict[str, dict] = {}
    if queries:
        try:
            with open(EXPECTED_WALLS) as f:
                ref = json.load(f)
            # the reference walls are specific to one (sf, cpus) point —
            # at any other operating point they are not comparable
            if args.sf_dir.rstrip("/").endswith(f"sf{ref.get('sf')}") and args.cpus == ref.get("cpus"):
                expected = ref.get("expected", {})
        except OSError:
            pass
        flagged = [
            n
            for n in HEADLINE_QUERIES
            if n in expected
            and queries[n] >= OUTLIER_FLOOR
            and queries[n] > OUTLIER_RATIO * expected[n]
        ]
        for name in flagged:  # one targeted extra run each
            queries[name] = min(
                queries[name], time_query(spark, specs[name].fn, args.sf_dir)
            )
        pressure_outliers = {
            n: {"wall": queries[n], "expected": expected[n]}
            for n in flagged
            if queries[n] > OUTLIER_RATIO * expected[n]
        }

    pipeline: dict = {}
    if not args.skip_pipeline:
        pipeline = run_pipeline_bench(
            spark, args.rows, args.convs, args.work_dir, variants=not args.no_variants
        )

    sf = args.sf_dir.rstrip("/").split("sf")[-1]
    # ambient-conditions stamp: this sandbox is a shared microVM whose
    # host CPU steal swings identical runs up to 3x on minute scales —
    # readers interpret any outlier number against this probe (8-proc
    # scale: healthy windows ~90-115 M ops/s, badly-stolen ones < 70)
    import multiprocessing as mp

    t0 = time.time()
    with mp.Pool(8) as p:
        p.map(_burn, [4_000_000] * 8)
    calibration = round(8 * 4_000_000 / (time.time() - t0) / 1e6, 1)

    out = {
        "metric": "parsed+routed turns/sec end-to-end (pipeline) + headline query secs",
        "value": round(sum(queries.values()), 3) if queries else pipeline.get("wall_sec"),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": args.cpus,
        "calibration_mops": calibration,
        # steady-state reference total + queries still above the outlier
        # band AFTER their extra run — nonempty means this window was
        # crowded; compare `value` against `expected_total` accordingly
        "expected_total": (
            round(sum(expected[n] for n in queries if n in expected), 3)
            if expected
            else None
        ),
        "pressure_outliers": pressure_outliers,
        "pipeline": pipeline,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
