"""Isolated walls for the continuation-session operators (fresh JVM per
op, warmup at sf0.001 then best-of-3 at sf0.1, raw-CPU calibration
stamped — the BENCH/BASELINE.md isolation protocol).

Ops: persisted-IVF build + probe (float and SQ8), PQ encode, corpus
profile, hard-negative mining. Media pair walls are already recorded in
BENCH/media_dedup_sweep_r5.json.

Run quiet: PYTHONPATH=/root/repo python scripts/new_ops3_bench.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import subprocess
import sys
import time

WORKER = r"""
import sys, time, tempfile
sys.path.insert(0, "/root/repo")
from fluent_server_spark.session import get_spark
from fluent_server_spark.queries import load_table

op = sys.argv[1]
spark = get_spark("newops3-" + op, cpus=32)

def run(sf_dir, work):
    emb = load_table(spark, sf_dir, "embeddings")
    if op in ("ivf_build_float", "ivf_build_sq8", "ivf_probe_float", "ivf_probe_sq8"):
        from fluent_server_spark.operators import ivf
        cents = ivf.train_centroids(emb, k=16, dim=64)
        sq8 = op.endswith("sq8")
        if op.startswith("ivf_build"):
            t0 = time.time()
            ivf.write_ivf_index(emb, f"{work}/ix", cents, sq8=sq8)
            return time.time() - t0
        ivf.write_ivf_index(emb, f"{work}/ix", cents, sq8=sq8)
        q = emb.filter("vec_id < 40")
        t0 = time.time()
        ivf.ivf_topk_from_index(spark, f"{work}/ix", q, k=5, nprobe=2).write.mode(
            "overwrite").format("noop").save()
        return time.time() - t0
    if op == "pq_encode":
        from fluent_server_spark.operators import quantize as qz
        books = qz.train_pq_codebooks(emb, dim=64, m=8, n_codes=64)
        t0 = time.time()
        qz.pq_encode(emb, books).select("vec_id", "pq_codes").write.mode(
            "overwrite").format("noop").save()
        return time.time() - t0
    if op == "corpus_profile":
        from fluent_server_spark.operators.profile import corpus_profile
        docs = load_table(spark, sf_dir, "documents")
        t0 = time.time()
        corpus_profile(docs).write.mode("overwrite").format("noop").save()
        return time.time() - t0
    if op == "hard_negatives":
        from fluent_server_spark.queries.sketch_oracles import q_hard_negatives
        t0 = time.time()
        q_hard_negatives(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.time() - t0
    raise SystemExit(f"unknown op {op}")

with tempfile.TemporaryDirectory() as w:
    run("/root/testdata/sf0.001", w)  # warmup / JIT
walls = []
for _ in range(3):
    with tempfile.TemporaryDirectory() as w:
        walls.append(round(run("/root/testdata/sf0.1", w), 3))
print("ISOLATED " + repr(walls))
"""

OPS = [
    "ivf_build_float",
    "ivf_probe_float",
    "ivf_build_sq8",
    "ivf_probe_sq8",
    "pq_encode",
    "corpus_profile",
    "hard_negatives",
]


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i
    return s


def main() -> int:
    t0 = time.time()
    with mp.Pool(8) as p:
        p.map(_burn, [4_000_000] * 8)
    calibration = round(8 * 4_000_000 / (time.time() - t0) / 1e6, 1)
    out = {"sf": 0.1, "calibration_mops": calibration, "ops": {}}
    for op in OPS:
        try:
            r = subprocess.run(
                [sys.executable, "-c", WORKER, op],
                capture_output=True, text=True, timeout=900,
            )
        except subprocess.TimeoutExpired:
            # one runaway op must not discard the walls already measured
            out["ops"][op] = {"error": "timeout after 900s"}
            print(op, "TIMEOUT", flush=True)
            continue
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("ISOLATED")]
        if not line:
            out["ops"][op] = {"error": r.stderr[-400:]}
            print(op, "FAILED", flush=True)
            continue
        walls = eval(line[0].split(" ", 1)[1])  # trusted local output
        out["ops"][op] = {"walls": walls, "best": min(walls)}
        print(op, walls, flush=True)
    with open("/root/repo/BENCH/new_ops3_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"calibration_mops": calibration}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
