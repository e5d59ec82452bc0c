"""Property-based dedup invariants (hypothesis builds the corpora
driver-side; each Spark comparison runs as ONE job, mirroring
test_property_distances.py).

Covered invariants:
  - the shingle column expression == Python's sliding-window reference on
    arbitrary token streams (including n < width edge cases)
  - hash31 (md5-prefix mod Mersenne31) is bit-replicable outside the JVM,
    which is the portability contract the DuckDB oracles rely on
  - the MinHash signature aggregate is exactly min_j((a*h+b) mod P) over a
    doc's shingle hashes, so identical shingle sets always collide in
    every band (recall floor = 1.0 for true duplicates)
  - autotune_bands returns a design within budget whose s-curve threshold
    is no worse than every other feasible design (optimality, not just
    feasibility)
"""

import hashlib

from hypothesis import given, settings, strategies as st

from vector_db_from_scratch_spark.functions.hashing import MERSENNE31, minhash_params
from vector_db_from_scratch_spark.operators.dedup import (
    SHINGLE_WIDTH,
    autotune_bands,
    shingles,
)

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

_DOCS: list[str] = []


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12))
def test_collect_docs(toks):
    _DOCS.append(" ".join(toks))


def _py_shingles(text: str) -> list[str]:
    toks = text.split(" ")
    out, seen = [], set()
    for i in range(len(toks) - (SHINGLE_WIDTH - 1)):
        s = " ".join(toks[i : i + SHINGLE_WIDTH])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _py_hash31(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % MERSENNE31


def test_shingles_and_hash_match_python_reference(spark):
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.functions.hashing import hash31

    docs = sorted(set(_DOCS)) or ["alpha beta gamma delta"]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i long, text string")
    got = {
        r["i"]: (list(r["sh"]), list(r["hs"]))
        for r in df.select(
            "i",
            shingles(F.col("text")).alias("sh"),
            F.transform(shingles(F.col("text")), hash31).alias("hs"),
        ).collect()
    }
    for i, d in enumerate(docs):
        want = _py_shingles(d)
        assert got[i][0] == want, f"shingle mismatch for {d!r}"
        assert got[i][1] == [_py_hash31(s) for s in want]


def test_minhash_signature_is_min_over_hashes(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from vector_db_from_scratch_spark.operators.dedup import NUM_HASHES, _minhash_signature

    docs = [d for d in sorted(set(_DOCS)) if _py_shingles(d)] or ["alpha beta gamma delta"]
    # duplicate every doc under a shifted id: equal shingle sets MUST yield
    # equal signatures (the LSH recall floor for exact duplicates)
    n = len(docs)
    rows = []
    for i, d in enumerate(docs):
        for h in set(_py_hash31(s) for s in _py_shingles(d)):
            rows.append((i, h))
            rows.append((i + n, h))
    sh = spark.createDataFrame(rows, "doc_id long, sh long")
    sig = {r["doc_id"]: [r[f"m{j}"] for j in range(NUM_HASHES)]
           for r in _minhash_signature(sh).collect()}
    params = minhash_params(NUM_HASHES)
    for i, d in enumerate(docs):
        hs = [_py_hash31(s) for s in _py_shingles(d)]
        want = [min((a * h + b) % MERSENNE31 for h in hs) for (a, b) in params]
        assert sig[i] == want, f"signature mismatch for {d!r}"
        assert sig[i] == sig[i + n], "equal shingle sets must give equal signatures"


@settings(max_examples=50, deadline=None)
@given(st.floats(0.05, 0.95), st.integers(4, 24))
def test_autotune_bands_optimal_within_budget(threshold, max_hashes):
    b, r = autotune_bands(threshold, max_hashes)
    assert 1 <= b and 1 <= r and b * r <= max_hashes
    t_chosen = (1.0 / b) ** (1.0 / r)
    best = min(
        abs((1.0 / bb) ** (1.0 / rr) - threshold)
        for rr in range(1, max_hashes + 1)
        for bb in range(1, max_hashes // rr + 1)
    )
    assert abs(t_chosen - threshold) <= best + 1e-12


def test_decontaminate_excludes_benchmark_docs(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.corpus import (
        BENCH_MOD,
        corpus_decontaminate,
    )

    rows = corpus_decontaminate(spark, sf_dir).collect()
    assert rows, "corpus must contain contaminated training docs"
    assert all(r["doc_id"] % BENCH_MOD != 0 and r["n_overlap"] >= 1 for r in rows)


def test_repetition_metrics_bounds(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.textops import repetition_metrics

    rows = repetition_metrics(spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs_n
    for r in rows:
        assert 0.0 < r["top_word_frac"] <= 1.0
        assert 0.0 <= r["dup_bigram_frac"] < 1.0
        assert r["repetitive"] == (
            r["top_word_frac"] > 0.20 or r["dup_bigram_frac"] > 0.20
        )


def test_repetition_fast_equals_expression(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.textops import repetition_metrics

    cols = ["doc_id", "n_tokens", "top_word_frac", "dup_bigram_frac", "repetitive"]
    fast = [tuple(r[c] for c in cols) for r in repetition_metrics(spark, sf_dir, fast=True).collect()]
    expr = [tuple(r[c] for c in cols) for r in repetition_metrics(spark, sf_dir, fast=False).collect()]
    assert fast == expr


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_match_union_find(spark, raw_pairs):
    """Spark min-label propagation == a Python union-find on random graphs."""
    from vector_db_from_scratch_spark.operators.dedup import connected_components

    pairs = [(min(a, b), max(a, b)) for a, b in raw_pairs]
    pdf = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {r["node"]: r["cluster_rep"] for r in connected_components(pdf).collect()}

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    nodes = {n for p in pairs for n in p}
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    want = {n: min(members) for members in comp.values() for n in members}
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=25,
    )
)
def test_star_components_match_propagation(spark, raw_pairs):
    """Alternating large-star/small-star == min-label propagation on
    random graphs (the documented O(log^2 n) upgrade path must be a
    drop-in: same (node, cluster_rep) contract)."""
    from vector_db_from_scratch_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = [(min(a, b), max(a, b)) for a, b in raw_pairs]
    pdf = spark.createDataFrame(pairs, "d1 long, d2 long")
    prop = {r["node"]: r["cluster_rep"] for r in connected_components(pdf).collect()}
    star = {r["node"]: r["cluster_rep"] for r in connected_components_star(pdf).collect()}
    assert star == prop


def test_star_components_long_chain(spark):
    """A path graph (diameter = n-1, the propagation worst case) collapses
    to one component labeled by its minimum."""
    from vector_db_from_scratch_spark.operators.dedup import connected_components_star

    n = 24
    pdf = spark.createDataFrame([(i, i + 1) for i in range(n)], "d1 long, d2 long")
    got = {r["node"]: r["cluster_rep"] for r in connected_components_star(pdf).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_star_components_converge_fast_on_long_chain(spark):
    """O(log^2 n) convergence pinned operationally: a diameter-48 path
    collapses within 8 alternation rounds (min-label propagation would
    need 48) -- if it had not converged by max_rounds the labels would be
    wrong and the assertion below would fail."""
    from vector_db_from_scratch_spark.operators.dedup import connected_components_star

    n = 48
    pdf = spark.createDataFrame([(i, i + 1) for i in range(n)], "d1 long, d2 long")
    got = {
        r["node"]: r["cluster_rep"]
        for r in connected_components_star(pdf, max_rounds=8).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}
