"""Synthesize a larger scale-factor testdata dir for LOCAL measurement.

The driver generates its own large-sf inputs for the round-end bench; the
checked-in testdata stops at sf0.1. This script extrapolates the observed
sf0.1 distributions (schemas, value ranges, duplicate/near-dup rates,
vocab, skew) to an arbitrary scale factor so that before/after walls for
optimization work can be measured at the driver's operating point
(BENCH_r05.json: sf=1.0). It is a measurement tool only — nothing in the
query paths reads its output unless $SPARK_GRAFT_SF_DIR points at it.

Distributions mirrored from /root/testdata/sf0.1 (verified by inspection):
* documents: 30-word vocab, 10-100 words/doc uniform, ~5%% docs are a
  prior doc's text + " dup" (near-dup fixture), ~0.3%% exact duplicates,
  lang {en:40%%, zh/es/fr/de:15%%}, source src0..src19 round-robin.
* events: 5 uniform event types, ts monotone-ish over 30 days, value
  exp(mean 50) clipped at ~560, props '{"k": N}' N in 0..99, 10 users/k.
* embeddings: 64-dim unit float32 vectors, label uniform 0..9 (the sf0.1
  vectors are isotropic — labels are NOT clusters; verified: zero pairs
  above cos 0.8 in 2000 vectors).
* tpch tables: ranges and categorical frequencies copied from sf0.1.

Usage: python scripts/make_sf.py 1.0 [/root/testdata/sf1.0]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()

LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")


def write(path: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(path, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    lens = rng.integers(10, 101, size=n)
    texts: list[str] = []
    vocab = np.array(VOCAB)
    dup_flags = rng.random(n)
    for i in range(n):
        if i > 100 and dup_flags[i] < 0.05:
            texts.append(texts[rng.integers(0, i - 1)] + " dup")
        elif i > 100 and dup_flags[i] < 0.053:
            texts.append(texts[rng.integers(0, i - 1)])
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), size=lens[i])]))
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    source = np.array([f"src{i % 20}" for i in rng.integers(0, 20, size=n)])
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(lang),
            "source": pa.array(source),
            "n_chars": pa.array(n_chars),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    gaps = rng.exponential(30 * 86400 / n, size=n)
    ts = EPOCH_2024 + (np.cumsum(gaps) * 1e6).astype("int64")
    etypes = rng.choice(["signup", "purchase", "view", "click", "error"], size=n)
    value = np.round(np.minimum(rng.exponential(50.0, size=n), 560.0), 2)
    props = np.array([f'{{"k": {k}}}' for k in range(100)])[rng.integers(0, 100, n)]
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, size=n)),
            "event_type": pa.array(etypes),
            "value": pa.array(value),
            "props": pa.array(props),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    v = rng.standard_normal((n, dim))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(v.astype(np.float32).ravel()), dim
    ).cast(pa.list_(pa.float32()))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
            "embedding": emb,
        }
    )


def days(rng: np.random.Generator, n: int, lo: str, hi: str) -> pa.Array:
    a = np.datetime64(lo).astype("int64")
    b = np.datetime64(hi).astype("int64")
    d = rng.integers(a, b + 1, size=n).astype("datetime64[D]")
    return pa.array(d.astype("datetime64[us]"), type=pa.timestamp("us"))


def gen_tpch(rng: np.random.Generator, path: str, s: float) -> None:
    n_cust = int(150_000 * s)
    n_supp = int(10_000 * s)
    n_part = int(200_000 * s)
    n_ord = int(1_500_000 * s)
    n_li = int(6_000_000 * s)

    write(
        path,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(5, dtype=np.int64)),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
                ),
            }
        ),
    )
    write(
        path,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(25, dtype=np.int64)),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array(np.arange(25, dtype=np.int64) % 5),
            }
        ),
    )
    write(
        path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust)),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-1000, 10_000, n_cust), 2)
                ),
                "c_mktsegment": pa.array(
                    rng.choice(
                        ["MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "BUILDING", "FURNITURE"],
                        size=n_cust,
                    )
                ),
            }
        ),
    )
    write(
        path,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp)),
                "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10_000, n_supp), 2)),
            }
        ),
    )
    adjs = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
    nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
    names = np.array([f"{a} {b}" for a in adjs for b in nouns])
    write(
        path,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": pa.array(names[rng.integers(0, len(names), n_part)]),
                "p_brand": pa.array(
                    np.array([f"Brand#{i}" for i in range(1, 26)])[
                        rng.integers(0, 25, n_part)
                    ]
                ),
                "p_type": pa.array(
                    rng.choice(
                        ["ECONOMY", "PROMO", "MEDIUM", "SMALL", "LARGE", "STANDARD"],
                        size=n_part,
                    )
                ),
                "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
                "p_retailprice": pa.array(
                    np.round(900.0 + rng.uniform(0, 100, n_part), 2)
                ),
            }
        ),
    )
    write(
        path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
                "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], size=n_ord)),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000, 500_000, n_ord), 2)
                ),
                "o_orderdate": days(rng, n_ord, "1995-01-01", "2001-08-01"),
                "o_orderpriority": pa.array(
                    rng.choice(
                        [
                            "1-URGENT",
                            "2-HIGH",
                            "3-MEDIUM",
                            "4-NOT SPECIFIED",
                            "5-LOW",
                        ],
                        size=n_ord,
                    )
                ),
            }
        ),
    )
    write(
        path,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_ord, n_li)),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
                "l_linenumber": pa.array(rng.integers(1, 8, n_li).astype(np.int32)),
                "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900, 105_000, n_li), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, n_li) * 0.01, 2)
                ),
                "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
                "l_returnflag": pa.array(rng.choice(["R", "A", "N"], size=n_li)),
                "l_linestatus": pa.array(rng.choice(["O", "F"], size=n_li)),
                "l_shipdate": days(rng, n_li, "1995-01-02", "2001-11-04"),
            }
        ),
    )


def main() -> int:
    s = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    path = sys.argv[2] if len(sys.argv) > 2 else f"/root/testdata/sf{s}"
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(np.random.SeedSequence(20260822))
    print(f"synthesizing sf={s} at {path}")
    gen_tpch(rng, path, s)
    write(path, "events", gen_events(rng, int(1_000_000 * s), int(15_000 * s)))
    write(path, "documents", gen_documents(rng, int(50_000 * s)))
    write(path, "embeddings", gen_embeddings(rng, int(20_000 * s)))
    open(os.path.join(path, "_DONE"), "w").close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
