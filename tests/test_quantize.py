"""SQ8 embedding quantization: reconstruction error bound, degenerate
dims, clamping, ANN recall through the quantized corpus, and the
no-explode trainer plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.quantize import (
    dequantize_embeddings,
    embedding_bounds,
    quantize_embeddings,
)

DIM = 16


def test_roundtrip_error_bound(spark, vec_df):
    mins, maxs = embedding_bounds(vec_df, DIM)
    q = quantize_embeddings(vec_df, mins, maxs)
    deq = dequantize_embeddings(
        q.select("vec_id", "q_embedding"), mins, maxs, out_col="deq"
    )
    joined = vec_df.join(deq, "vec_id").select("embedding", "deq").collect()
    bound = np.array([(mx - mn) / 255.0 / 2.0 + 1e-12 for mn, mx in zip(mins, maxs)])
    for r in joined:
        err = np.abs(np.array(r.embedding) - np.array(r.deq))
        assert (err <= bound).all(), err.max()


def test_codes_are_bytes_and_degenerate_dims_exact(spark):
    rows = [(0, [1.0, 5.0]), (1, [3.0, 5.0]), (2, [2.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mins, maxs = embedding_bounds(df, 2)
    assert mins == [1.0, 5.0] and maxs == [3.0, 5.0]
    q = {r.vec_id: list(r.q_embedding) for r in quantize_embeddings(df, mins, maxs).collect()}
    assert q[0] == [0, 0] and q[1] == [255, 0] and q[2] == [128, 0]
    deq = dequantize_embeddings(
        quantize_embeddings(df, mins, maxs).select("vec_id", "q_embedding"),
        mins, maxs, out_col="d",
    )
    # degenerate dim decodes EXACTLY; out-of-range future values clamp
    assert all(r.d[1] == 5.0 for r in deq.collect())
    drift = spark.createDataFrame([(9, [99.0, 5.0])], "vec_id long, embedding array<double>")
    qd = quantize_embeddings(drift, mins, maxs).collect()[0].q_embedding
    assert list(qd) == [255, 0]


def test_ann_recall_through_quantized_corpus(spark, vec_df):
    from fluent_server_spark.operators.similarity import brute_force_topk

    mins, maxs = embedding_bounds(vec_df, DIM)
    stored = quantize_embeddings(vec_df, mins, maxs).select("vec_id", "q_embedding")
    corpus = dequantize_embeddings(stored, mins, maxs, out_col="embedding")
    queries = vec_df.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(queries, vec_df, k=5).collect()
    }
    viaq = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(queries, corpus, k=5).collect()
    }
    recall = len(exact & viaq) / len(exact)
    assert recall >= 0.95, recall


def test_trainer_plan_has_no_explode(spark, vec_df):
    # the PRODUCTION bounds agg must be a plain partial+final
    # aggregation — no Generate (row blowup), no Python
    from fluent_server_spark.operators.quantize import bounds_agg

    plan = bounds_agg(vec_df, DIM)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan and "Python" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_bounds_fail_loud_on_bad_corpora(spark):
    from fluent_server_spark.operators.quantize import (
        embedding_bounds,
        train_pq_codebooks,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        embedding_bounds(empty, 4)
    with pytest.raises(ValueError, match="empty corpus"):
        train_pq_codebooks(empty, dim=4, m=2, n_codes=4)
    nan = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [float("nan"), 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="NaN"):
        embedding_bounds(nan, 2)
    with pytest.raises(ValueError, match="NaN"):
        train_pq_codebooks(nan, dim=2, m=1, n_codes=2)
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="size != 2"):
        embedding_bounds(ragged, 2, check_dim=True)
    with pytest.raises(ValueError, match="size != 2"):
        train_pq_codebooks(ragged, dim=2, m=1, n_codes=2)


def test_sq8_ivf_index_end_to_end(spark, vec_df, tmp_path):
    """Quantized persisted IVF: ~1 byte/dim at rest, append with frozen
    bounds, compaction preserves results, recall >= 0.9 of the float
    index's top-k."""
    from fluent_server_spark.operators.ivf import (
        append_to_ivf_index,
        compact_ivf_index,
        ivf_topk_from_index,
        read_ivf_manifest,
        train_centroids,
        write_ivf_index,
    )

    cents = train_centroids(vec_df, k=6, dim=DIM, n_iter=10)
    base = vec_df.filter(F.col("vec_id") < 90)
    batch = vec_df.filter(F.col("vec_id") >= 90)
    fpath, qpath = str(tmp_path / "f"), str(tmp_path / "q")
    write_ivf_index(vec_df, fpath, cents)
    write_ivf_index(base, qpath, cents, sq8=True)
    append_to_ivf_index(batch, qpath, epoch=0)
    assert "sq8" in read_ivf_manifest(qpath)
    queries = vec_df.filter(
        (F.col("vec_id") < 6) | (F.col("vec_id").between(100, 105))
    )
    fl = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_from_index(spark, fpath, queries, k=5, nprobe=3).collect()
    }
    qz = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_from_index(spark, qpath, queries, k=5, nprobe=3).collect()
    }
    assert len(fl & qz) / len(fl) >= 0.9, len(fl & qz) / len(fl)
    # compaction keeps the quantized index byte-stable
    before = sorted(
        tuple(r)
        for r in ivf_topk_from_index(spark, qpath, queries, k=5, nprobe=3).collect()
    )
    assert compact_ivf_index(spark, qpath) == 1
    after = sorted(
        tuple(r)
        for r in ivf_topk_from_index(spark, qpath, queries, k=5, nprobe=3).collect()
    )
    assert before == after


# ------------------------------------------------- product quantization


def test_pq_encode_decode_and_recall(spark, vec_df):
    from fluent_server_spark.operators.quantize import (
        pq_decode,
        pq_encode,
        train_pq_codebooks,
    )
    from fluent_server_spark.operators.similarity import brute_force_topk

    books = train_pq_codebooks(vec_df, dim=DIM, m=8, n_codes=32)
    assert len(books) == 8 and all(len(b) == 32 for b in books)
    assert all(len(c) == DIM // 8 for b in books for c in b)

    enc = pq_encode(vec_df, books).select("vec_id", "pq_codes")
    codes = enc.collect()
    assert all(0 <= c < 32 for r in codes for c in r.pq_codes)
    assert all(len(r.pq_codes) == 8 for r in codes)

    corpus = pq_decode(enc, books, out_col="embedding")
    # reconstruction: every decoded vector is its blocks' centroids
    import numpy as np

    one = corpus.filter(F.col("vec_id") == 0).collect()[0]
    want = np.concatenate([np.array(books[b][one.pq_codes[b]]) for b in range(8)])
    assert np.allclose(np.array(one.embedding), want)

    queries = vec_df.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(queries, vec_df, k=5).collect()
    }
    viapq = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(queries, corpus, k=5).collect()
    }
    recall = len(exact & viapq) / len(exact)
    assert recall >= 0.7, recall  # 8 bytes/vector vs 128 — lossy by design


def test_pq_validation(spark, vec_df):
    from fluent_server_spark.operators.quantize import train_pq_codebooks

    with pytest.raises(ValueError, match="divide"):
        train_pq_codebooks(vec_df, dim=DIM, m=5)
    with pytest.raises(ValueError, match="byte"):
        train_pq_codebooks(vec_df, dim=DIM, m=4, n_codes=512)


def test_pq_encode_plan_is_narrow(spark, vec_df):
    from fluent_server_spark.operators.quantize import (
        pq_encode,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(vec_df, dim=DIM, m=4, n_codes=8)
    plan = pq_encode(vec_df, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan and "Python" not in plan
