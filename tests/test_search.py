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
