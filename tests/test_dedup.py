"""Dedup operator behavior (beyond the oracle parity already covered by
test_oracle_parity): planted near-duplicates must be found, LSH candidates
must be a superset-filtered subset of the exact method at equal threshold."""

from pyspark.sql import functions as F

from vector_db_from_scratch_spark.operators.dedup import (
    embedding_neardup,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_table,
)


def test_exact_dedup_identity_when_unique(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert exact_dedup(spark, sf_dir).count() == docs.count()


def test_ngram_jaccard_finds_planted_near_dups(spark, sf_dir):
    pairs = ngram_jaccard_pairs(spark, sf_dir, threshold=0.3).collect()
    assert len(pairs) > 0
    assert all(0.3 <= p["jaccard"] <= 1.0 and p["d1"] < p["d2"] for p in pairs)


def test_minhash_subset_of_exact(spark, sf_dir):
    """LSH+verify returns exactly the exact-Jaccard pairs that land in a
    shared band -- always a subset at the same threshold."""
    exact = {
        (p["d1"], p["d2"]): p["jaccard"]
        for p in ngram_jaccard_pairs(spark, sf_dir, threshold=0.3).collect()
    }
    lsh = {
        (p["d1"], p["d2"]): p["jaccard"]
        for p in minhash_lsh_pairs(spark, sf_dir, threshold=0.3).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # high-similarity pairs should survive banding (recall sanity)
    high = {k for k, v in exact.items() if v >= 0.8}
    assert high <= set(lsh)


def test_minhash_bucketcap_auto_sound(spark, sf_dir):
    """The budget-derived-cap variant still only emits true near-dup pairs
    (subset of the exact all-pairs graph at the same threshold, identical
    Jaccard values)."""
    from vector_db_from_scratch_spark.operators.dedup import (
        minhash_lsh_pairs_bucketcap_auto,
    )

    exact = {
        (p["d1"], p["d2"]): p["jaccard"]
        for p in ngram_jaccard_pairs(spark, sf_dir, threshold=0.3).collect()
    }
    auto = {
        (p["d1"], p["d2"]): p["jaccard"]
        for p in minhash_lsh_pairs_bucketcap_auto(spark, sf_dir, threshold=0.3).collect()
    }
    assert auto, "budget cap must not erase the planted near-dups at fixture scale"
    assert set(auto) <= set(exact)
    for k, v in auto.items():
        assert v == exact[k]


def test_minhash_bucket_cap_monotone(spark, sf_dir):
    """Raising the band-bucket cap only ever ADDS pairs (the cap is a
    drop-only guard), and an effectively-unbounded cap reproduces at least
    the default-cap result."""
    tight = {
        (p["d1"], p["d2"])
        for p in minhash_lsh_pairs(spark, sf_dir, threshold=0.3, bucket_cap=8).collect()
    }
    default = {
        (p["d1"], p["d2"])
        for p in minhash_lsh_pairs(spark, sf_dir, threshold=0.3).collect()
    }
    unbounded = {
        (p["d1"], p["d2"])
        for p in minhash_lsh_pairs(
            spark, sf_dir, threshold=0.3, bucket_cap=1 << 30
        ).collect()
    }
    assert tight <= default <= unbounded


def test_shingles_short_text(spark):
    df = spark.createDataFrame([("one two",), ("one two three four",)], "text string")
    rows = df.select(F.size(shingles(F.col("text"))).alias("n")).collect()
    assert [r["n"] for r in rows] == [0, 2]


def test_simhash_is_16bit(spark, sf_dir):
    rows = simhash_table(spark, sf_dir).collect()
    assert all(0 <= r["simhash"] < 2**16 for r in rows)


def test_embedding_neardup_symmetric_free(spark, sf_dir):
    pairs = embedding_neardup(spark, sf_dir, threshold=0.4).collect()
    assert all(p["v1"] < p["v2"] for p in pairs)


def test_embedding_neardup_fast_equals_expression(spark, sf_dir):
    """The applyInPandas block-matmul path and the pure-expression path must
    agree exactly after 6-dp rounding."""
    fast = {tuple(r) for r in embedding_neardup(spark, sf_dir, fast=True).collect()}
    expr = {tuple(r) for r in embedding_neardup(spark, sf_dir, fast=False).collect()}
    assert fast == expr and fast


def test_shingle_index_fast_equals_expression(spark, sf_dir):
    from vector_db_from_scratch_spark.operators.dedup import _shingle_index

    fast = {tuple(r) for r in _shingle_index(spark, sf_dir, fast=True).collect()}
    expr = {tuple(r) for r in _shingle_index(spark, sf_dir, fast=False).collect()}
    assert fast == expr and fast


def test_autotune_bands_scurve_inversion():
    """The chosen (b, r) must give the closest achievable s-curve threshold
    and respect the hash budget; spot-check the known design points."""
    from vector_db_from_scratch_spark.operators.dedup import autotune_bands

    for t in (0.3, 0.5, 0.63, 0.8, 0.9):
        b, r = autotune_bands(t, max_hashes=16)
        assert 1 <= b * r <= 16
        achieved = (1.0 / b) ** (1.0 / r)
        # no other scheme within budget is strictly closer
        best = min(
            abs((1.0 / bb) ** (1.0 / rr) - t)
            for rr in range(1, 17)
            for bb in range(1, 16 // rr + 1)
        )
        assert abs(achieved - t) == best
    # higher threshold -> higher achieved inflection point (monotone dial)
    pts = [
        (1.0 / b) ** (1.0 / r)
        for b, r in (autotune_bands(t) for t in (0.3, 0.6, 0.9))
    ]
    assert pts[0] < pts[1] < pts[2]


def test_autotuned_minhash_candidates_subset_of_exact(spark, sf_dir):
    """Autotuned LSH pairs (exact-verified) are a subset of the exact
    Jaccard pairs at the same threshold."""
    from vector_db_from_scratch_spark.operators.dedup import (
        minhash_lsh_pairs_autotuned,
        ngram_jaccard_pairs,
    )

    exact = {(r["d1"], r["d2"]) for r in ngram_jaccard_pairs(spark, sf_dir, 0.5).collect()}
    auto = {(r["d1"], r["d2"]) for r in minhash_lsh_pairs_autotuned(spark, sf_dir, 0.5).collect()}
    assert auto <= exact
    assert auto  # planted near-dups survive banding at 0.5


def test_cluster_components_closed_and_minimal(spark, sf_dir):
    """Every near-dup pair's endpoints land in the same cluster; the rep is
    the minimum doc_id of its cluster (and therefore labels itself). The
    cluster graph builds on the df-capped flagship pairs; the uncapped
    self-join is the recall cross-check (capped ⊆ uncapped)."""
    from vector_db_from_scratch_spark.operators.dedup import (
        neardup_clusters,
        ngram_jaccard_pairs_dfcap,
    )

    labels = {
        r["doc_id"]: r["cluster_rep"]
        for r in neardup_clusters(spark, sf_dir, threshold=0.3).collect()
    }
    pairs = ngram_jaccard_pairs_dfcap(spark, sf_dir, threshold=0.3).collect()
    assert pairs, "fixture must contain planted near-dups"
    capped = {(p["d1"], p["d2"]) for p in pairs}
    uncapped = {
        (p["d1"], p["d2"])
        for p in ngram_jaccard_pairs(spark, sf_dir, threshold=0.3).collect()
    }
    assert capped <= uncapped, "df-cap must only ever DROP pairs, never invent them"
    assert capped, "df-capped candidate generation found none of the planted dups"
    for p in pairs:
        assert labels[p["d1"]] == labels[p["d2"]]
    for doc, rep in labels.items():
        assert rep <= doc
        assert labels[rep] == rep
    # reps are exactly the cluster minima
    for rep in set(labels.values()):
        members = [d for d, r in labels.items() if r == rep]
        assert min(members) == rep


def test_chunk_documents_reconstructs_and_overlaps(spark, sf_dir):
    """Chunk windows: stride-spaced starts, full coverage (concatenating
    the non-overlap prefixes + last chunk rebuilds the document), chunk_len
    matches the text, ids unique."""
    from vector_db_from_scratch_spark.operators.corpus import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        corpus_chunk_documents,
    )

    chunks = corpus_chunk_documents(spark, sf_dir).collect()
    ids = [c["chunk_id"] for c in chunks]
    assert len(ids) == len(set(ids))
    docs = {
        r["doc_id"]: r["text"] or ""
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").limit(0).collect()
    }
    # spot-check reconstruction on a handful of docs
    full = {
        r["doc_id"]: r["text"] or ""
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 5")
        .collect()
    }
    for doc_id, text in full.items():
        mine = sorted(
            [c for c in chunks if c["doc_id"] == doc_id], key=lambda c: c["chunk_idx"]
        )
        assert all(c["chunk_len"] == len(c["chunk_text"]) for c in mine)
        rebuilt = "".join(c["chunk_text"][:CHUNK_STRIDE] for c in mine[:-1]) + mine[-1]["chunk_text"]
        assert rebuilt == text
        for c in mine[:-1]:
            assert len(c["chunk_text"]) <= CHUNK_SIZE


def test_incremental_ingest_verdicts_consistent(spark, sf_dir):
    """Every delta doc gets exactly one verdict; exact_dup docs really have
    an identical earlier/base text, and 'new' docs have none."""
    from vector_db_from_scratch_spark.operators.dedup import (
        INGEST_DELTA_BUCKETS,
        INGEST_DELTA_MOD,
        incremental_ingest_dedup,
    )

    rows = incremental_ingest_dedup(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    delta_ids = {i for i in docs if i % INGEST_DELTA_MOD in INGEST_DELTA_BUCKETS}
    assert {r["doc_id"] for r in rows} == delta_ids
    for r in rows:
        i, text = r["doc_id"], docs[r["doc_id"]]
        earlier_same = any(
            docs[j] == text
            for j in docs
            if j != i and (j % INGEST_DELTA_MOD not in INGEST_DELTA_BUCKETS or j < i)
        )
        if r["verdict"] == "exact_dup":
            assert earlier_same, i
        elif r["verdict"] == "new":
            assert not earlier_same, i


def test_repeated_spans_match_python_reference(spark, sf_dir):
    """dedup_repeated_spans: the full per-doc span report must equal a
    brute-force Python reference (dict of gram -> doc set, interval merge
    per doc) -- corpus-independent ground truth for the distributed
    k-gram + gaps-and-islands pipeline."""
    from collections import defaultdict

    from vector_db_from_scratch_spark.operators.dedup import (
        K_SPAN,
        repeated_substring_spans,
    )

    got = {
        r["doc_id"]: (
            r["n_spans"],
            r["max_span_len"],
            r["repeated_chars"],
            r["repeated_frac"],
        )
        for r in repeated_substring_spans(spark, sf_dir).collect()
    }
    assert got, "synthetic corpus must contain cross-doc repeats"

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    gram_docs = defaultdict(set)
    for doc_id, text in docs.items():
        for i in range(len(text) - K_SPAN + 1):
            gram_docs[text[i : i + K_SPAN]].add(doc_id)
    expected = {}
    for doc_id, text in docs.items():
        pos = [
            i
            for i in range(len(text) - K_SPAN + 1)
            if len(gram_docs[text[i : i + K_SPAN]]) >= 2
        ]
        if not pos:
            continue
        spans = []
        s = e = pos[0]
        for p in pos[1:]:
            if p - e > K_SPAN:
                spans.append((s, e + K_SPAN - 1))
                s = p
            e = p
        spans.append((s, e + K_SPAN - 1))
        rep = sum(b - a + 1 for a, b in spans)
        import math

        # engines round HALF-UP (53/128 hits an exact .5 at the 6th
        # decimal); Python's round() is half-to-even
        frac = math.floor(rep / len(text) * 1e6 + 0.5) / 1e6
        expected[doc_id] = (
            len(spans),
            max(b - a + 1 for a, b in spans),
            rep,
            frac,
        )
    assert got == expected


def test_repeated_spans_arrow_declarative_twins_agree(spark, sf_dir):
    """The Arrow rolling-hash gram kernel and its declarative
    xxhash64(substring) twin hash DIFFERENT values but must induce the
    SAME gram partition -- the full span reports must be identical."""
    from vector_db_from_scratch_spark.operators.dedup import (
        repeated_substring_spans,
    )

    arrow = sorted(
        map(tuple, repeated_substring_spans(spark, sf_dir, use_arrow=True).collect())
    )
    decl = sorted(
        map(tuple, repeated_substring_spans(spark, sf_dir, use_arrow=False).collect())
    )
    assert arrow == decl
    assert arrow, "corpus must contain cross-doc repeats"


def test_levenshtein_cross_engine_contract(spark):
    """The edit-distance verifier rests on both engines shipping classic
    unit-cost Levenshtein; pin a constructed matrix of cases equal."""
    import duckdb

    cases = [
        ("kitten", "sitting"),
        ("abc", ""),
        ("", "xy"),
        ("same", "same"),
        ("the quick brown fox", "the quik brown foxx"),
        ("a" * 50, "b" * 50),
        ("prefix shared tail A", "prefix shared tail B"),
    ]
    df = spark.createDataFrame(cases, "a string, b string")
    got = [r["d"] for r in df.select(F.levenshtein("a", "b").alias("d")).collect()]
    want = [
        duckdb.sql(f"SELECT levenshtein('{a}', '{b}')").fetchone()[0] for a, b in cases
    ]
    assert got == want


def test_edit_distance_pairs_subset_of_candidates(spark, sf_dir):
    """Every emitted pair is a banded candidate (the verifier only ever
    REMOVES), the distance column is within [0, EDIT_MAX], and at least
    one pair has a nonzero distance (the verifier measures real edits,
    not just exact-prefix duplicates)."""
    from vector_db_from_scratch_spark.operators.dedup import (
        BAND_SIZE,
        BUCKET_CAP,
        EDIT_MAX,
        NUM_HASHES,
        _minhash_candidates,
        edit_distance_pairs,
    )

    got = edit_distance_pairs(spark, sf_dir).collect()
    cand = {
        (r["d1"], r["d2"])
        for r in _minhash_candidates(
            spark, sf_dir, 0.3, NUM_HASHES, BAND_SIZE, BUCKET_CAP
        ).collect()
    }
    assert got
    assert all((r["d1"], r["d2"]) in cand for r in got)
    assert all(0 <= r["edit_distance"] <= EDIT_MAX for r in got)
    assert any(r["edit_distance"] > 0 for r in got)


def test_edit_distance_filter_excludes_far_pairs(spark):
    """EDIT_MAX semantics on a constructed frame: the same expression the
    operator applies drops pairs whose prefixes differ by more than the
    budget."""
    from vector_db_from_scratch_spark.operators.dedup import EDIT_MAX, EDIT_PREFIX_LEN

    near = ("x" * 100, "x" * 100 + "y" * 10)          # distance 10
    far = ("a" * EDIT_PREFIX_LEN, "b" * EDIT_PREFIX_LEN)  # distance PREFIX_LEN
    df = spark.createDataFrame([near, far], "t1 string, t2 string")
    kept = (
        df.select(
            F.levenshtein(
                F.substring("t1", 1, EDIT_PREFIX_LEN),
                F.substring("t2", 1, EDIT_PREFIX_LEN),
            ).alias("d")
        )
        .filter(F.col("d") <= EDIT_MAX)
        .collect()
    )
    assert [r["d"] for r in kept] == [10]


def test_leakage_safe_split_properties(spark, sf_dir):
    """Cluster-keyed split can never straddle a near-dup pair
    (safe_violations == 0 everywhere), the naive doc-keyed audit records a
    real leak on this corpus, and doc counts partition the corpus."""
    import pyarrow.parquet as pq

    from vector_db_from_scratch_spark.operators.corpus import leakage_safe_split

    rows = leakage_safe_split(spark, sf_dir).collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert all(r["safe_violations"] == 0 for r in rows)
    assert all(r["naive_violations"] > 0 for r in rows)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(r["n_clusters"] <= r["n_docs"] for r in rows)


def test_canonical_select_policy_and_partition(spark, sf_dir):
    """The canonical pick is the (n_chars DESC, doc_id) argmax of its own
    cluster; cluster sizes partition the clustered-doc set; every keep
    doc belongs to the cluster it represents."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators.dedup import (
        canonical_select,
        minhash_lsh_pairs,
        _clusters_cached,
    )
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = canonical_select(spark, sf_dir).collect()
    assert rows
    pairs = minhash_lsh_pairs(spark, sf_dir).select("d1", "d2")
    labels = {
        r["node"]: r["cluster_rep"]
        for r in _clusters_cached(spark, sf_dir, 0.3, "minhash", pairs).collect()
    }
    nchars = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    by_cluster: dict[int, list[int]] = {}
    for d, c in labels.items():
        by_cluster.setdefault(c, []).append(d)
    assert sum(r["cluster_size"] for r in rows) == len(labels)
    assert {r["cluster_rep"] for r in rows} == set(by_cluster)
    for r in rows:
        members = by_cluster[r["cluster_rep"]]
        assert r["cluster_size"] == len(members)
        assert r["dropped"] == len(members) - 1
        best = min(members, key=lambda d: (-nchars[d], d))
        assert r["keep_doc_id"] == best
        assert r["keep_n_chars"] == nchars[best]
    # the quality policy must actually differ from keep-lowest-id
    # somewhere, or the test is vacuous against that simpler rule
    assert any(
        r["keep_doc_id"] != min(by_cluster[r["cluster_rep"]]) for r in rows
    )


def test_curation_verdict_reconciles_with_pipeline_stages(spark, sf_dir):
    """The per-document decision table must partition the corpus: exactly
    one verdict per doc, 'kept' ids exactly the clean-stage survivors,
    and the reason counts reconcile with the stage DataFrames."""
    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators import corpus

    st = corpus._corpus_stages(spark, sf_dir)
    rows = corpus.curation_verdict(spark, sf_dir).collect()
    total = st["docs"].count()
    assert len(rows) == total
    assert len({r["doc_id"] for r in rows}) == total
    kept = {r["doc_id"] for r in rows if r["verdict"] == "kept"}
    clean = {r["doc_id"] for r in st["clean"].select("doc_id").collect()}
    assert kept == clean
    by_verdict: dict[str, int] = {}
    for r in rows:
        by_verdict[r["verdict"]] = by_verdict.get(r["verdict"], 0) + 1
    # gate-stage rejections (quality + lang) account for docs - gated
    gated = st["gated"].count()
    assert by_verdict.get("quality", 0) + by_verdict.get("lang", 0) == total - gated
    assert by_verdict.get("exact_dup", 0) == gated - st["survivors"].count()
    assert by_verdict.get("near_dup", 0) == st["survivors"].count() - len(clean)
    # non-vacuous on this corpus: at least one rejection reason fires
    assert sum(v for k, v in by_verdict.items() if k != "kept") > 0


def test_epoch_shuffle_reshuffles_and_conserves_docs(spark, sf_dir):
    """Seeded epoch shuffle: every doc lands in exactly one shard per epoch,
    shards are roughly balanced, and the two epochs produce genuinely
    different permutations (different order fingerprints)."""
    from vector_db_from_scratch_spark.operators.corpus import (
        EPOCH_SHARDS,
        EPOCHS,
        corpus_epoch_shuffle,
    )

    rows = corpus_epoch_shuffle(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == set(EPOCHS)
    for e, shards in by_epoch.items():
        assert sum(r["n_docs"] for r in shards) == n_docs
        assert len(shards) <= EPOCH_SHARDS
        # hash-mod balance: no shard more than 3x the fair share
        assert max(r["n_docs"] for r in shards) <= 3 * max(1, n_docs // EPOCH_SHARDS)
    fp = {e: sorted((r["shard"], r["order_fingerprint"]) for r in s)
          for e, s in by_epoch.items()}
    assert fp[EPOCHS[0]] != fp[EPOCHS[1]]

    # determinism: a second invocation is bit-identical
    again = corpus_epoch_shuffle(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
