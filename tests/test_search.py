"""Keyword/hybrid search semantics (beyond the oracle parity already covered
by test_oracle_parity): BM25 hits must actually contain a query term, ranks
must be dense, and fused results must come from at least one input list."""

from pyspark.sql import functions as F

from vector_db_from_scratch_spark.operators.search import (
    DEFAULT_QUERY_TERMS,
    bm25_topk,
    hybrid_rrf,
    tfidf_top_terms,
)


def test_bm25_hits_contain_a_query_term(spark, sf_dir):
    rows = bm25_topk(spark, sf_dir, k=20).collect()
    assert 0 < len(rows) <= 20
    assert all(r["bm25"] > 0 for r in rows)
    ids = [r["doc_id"] for r in rows]
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", "text")
        .collect()
    )
    for d in docs:
        toks = set(d["text"].split(" "))
        assert toks & set(DEFAULT_QUERY_TERMS), f"doc {d['doc_id']} has no query term"


def test_bm25_scores_descending(spark, sf_dir):
    scores = [r["bm25"] for r in bm25_topk(spark, sf_dir, k=20).collect()]
    assert scores == sorted(scores, reverse=True)


def test_tfidf_ranks_dense_per_lang(spark, sf_dir):
    rows = tfidf_top_terms(spark, sf_dir, top_n=5).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["rank"])
    for lang, ranks in by_lang.items():
        assert ranks == list(range(1, len(ranks) + 1)), lang


def test_hybrid_rrf_fuses_both_lists(spark, sf_dir):
    fused = hybrid_rrf(spark, sf_dir, pool=50, k=20).collect()
    assert len(fused) == 20
    # every fused row carries at least one source rank, and rrf matches it
    for r in fused:
        assert r["vec_rank"] is not None or r["kw_rank"] is not None
        expect = (1.0 / (60 + r["vec_rank"]) if r["vec_rank"] else 0.0) + (
            1.0 / (60 + r["kw_rank"]) if r["kw_rank"] else 0.0
        )
        assert abs(r["rrf"] - expect) < 1e-12
    # a doc ranked #1 in both legs must outrank a doc present in only one
    both = [r for r in fused if r["vec_rank"] and r["kw_rank"]]
    single = [r for r in fused if (r["vec_rank"] is None) != (r["kw_rank"] is None)]
    if both and single:
        assert max(r["rrf"] for r in both) > 0


def test_sparse_dot_self_retrieval_and_python_reference(spark, sf_dir):
    """Sparse dot product: every returned score equals a from-scratch
    Python postings computation (order pinned)."""
    from collections import Counter

    from vector_db_from_scratch_spark.operators.search import sparse_dot_topk

    rows = sparse_dot_topk(spark, sf_dir, query_doc_id=0, k=15).collect()
    # raw (unnormalized) dot product: self-retrieval is top-k but not
    # necessarily rank 1 -- a longer doc repeating the shared terms can
    # out-score the query itself; the Python reference below pins the order
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    n = len(docs)
    tf = {d: Counter(toks) for d, toks in docs.items()}
    qtf = tf[0]
    df = Counter()
    for d, c in tf.items():
        for t in qtf:
            if t in c:
                df[t] += 1
    idf = {t: (2000 * n + df[t]) // (2 * df[t]) for t in qtf}
    want = {}
    for d, c in tf.items():
        s = sum(c[t] * idf[t] * qtf[t] * idf[t] for t in qtf if t in c)
        if s:
            want[d] = s
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r["doc_id"], r["score"]) for r in rows] == expect


def test_hybrid_sparse_dense_fuses_both_lists(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.search import hybrid_sparse_dense

    fused = hybrid_sparse_dense(spark, sf_dir, pool=50, k=20).collect()
    assert len(fused) == 20
    for r in fused:
        assert r["vec_rank"] is not None or r["sparse_rank"] is not None
        expect = (
            1.0 / (60 + r["vec_rank"]) if r["vec_rank"] else 0.0
        ) + (1.0 / (60 + r["sparse_rank"]) if r["sparse_rank"] else 0.0)
        assert abs(r["rrf"] - expect) < 1e-12
    scores = [r["rrf"] for r in fused]
    assert scores == sorted(scores, reverse=True)


def test_sparse_batch_matches_single_query_path(spark, sf_dir):
    """Batch sparse retrieval equals the single-query path per query."""
    from vector_db_from_scratch_spark.operators.search import (
        sparse_dot_batch,
        sparse_dot_topk,
    )

    batch = sparse_dot_batch(spark, sf_dir, num_queries=3, k=10).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["qdoc"], []).append((r["rank"], r["doc_id"], r["score"]))
    assert set(by_q) == {0, 1, 2}
    for qdoc, rows in by_q.items():
        single = sparse_dot_topk(spark, sf_dir, query_doc_id=qdoc, k=10).collect()
        assert sorted(rows) == [
            (i + 1, r["doc_id"], r["score"]) for i, r in enumerate(single)
        ]
