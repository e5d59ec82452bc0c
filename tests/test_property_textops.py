"""Property-based text-operator invariants (hypothesis generates corpora
driver-side; each Spark comparison runs as ONE job, mirroring
test_property_dedup.py).

Covered:
  - the char-entropy column expression == the Python/NumPy reference
    formula on arbitrary alphabet strings (including single-char and
    uniform edge cases), within the 6-dp rounding contract
  - entropy bounds: 0 for single-symbol strings, maximized (log2 |used|)
    by strings using every symbol equally
"""

import math
import random
from collections import Counter

from vector_db_from_scratch_spark.operators.textops import (
    ENTROPY_ALPHABET,
    char_entropy_expr,
)


def _build_corpus(n: int = 80, seed: int = 7) -> list[str]:
    """Deterministic random corpus built at import -- no cross-test
    execution-order coupling (a @given collector only fills a module
    global when it happens to run first), same coverage: arbitrary
    alphabet strings plus the degenerate edge cases."""
    rng = random.Random(seed)
    docs = {
        "".join(rng.choice(ENTROPY_ALPHABET) for _ in range(rng.randint(1, 40)))
        for _ in range(n)
    }
    docs.update({"a", "aab", "zzzz", "abc defg", " ", "a" * 40, ENTROPY_ALPHABET})
    return sorted(docs)


_DOCS = _build_corpus()


def _py_entropy(s: str) -> float:
    n = len(s)
    ent = 0.0
    for ch in ENTROPY_ALPHABET:  # same term order as the expression
        c = s.count(ch)
        if c > 0:
            p = c / n
            ent += -p * math.log2(p)
    return round(ent, 6) + 0.0


def test_entropy_expression_matches_python_reference(spark):
    docs = _DOCS
    df = spark.createDataFrame([(i, s) for i, s in enumerate(docs)], "i long, text string")
    got = {
        r["i"]: r["e"]
        for r in df.select("i", char_entropy_expr("text").alias("e")).collect()
    }
    for i, s in enumerate(docs):
        assert abs(got[i] - _py_entropy(s)) <= 1e-6, (s, got[i], _py_entropy(s))


def test_entropy_bounds(spark):
    single = "a" * 20
    uniform = ENTROPY_ALPHABET  # each symbol exactly once
    df = spark.createDataFrame(
        [(0, single), (1, uniform)], "i long, text string"
    )
    got = {r["i"]: r["e"] for r in df.select("i", char_entropy_expr("text").alias("e")).collect()}
    assert got[0] == 0.0
    assert abs(got[1] - math.log2(len(ENTROPY_ALPHABET))) < 1e-6


def test_pii_regex_cross_dialect_agreement(spark):
    """text_pii_scrub's gate assumes Java regex (Spark) and RE2 (DuckDB)
    agree on the email/phone patterns over arbitrary text. Fuzz strings
    built from a PII-adjacent alphabet (including partial/malformed
    addresses and numbers) and compare extraction counts AND the scrubbed
    output of both engines directly."""
    import duckdb

    from pyspark.sql import functions as F

    from vector_db_from_scratch_spark.operators.textops import PII_EMAIL, PII_PHONE

    rng = random.Random(20260814)
    tokens = [
        "a@b.co", "x.y@ex-1.org", "@nope", "no@", "a@b", "a@b.c", "u@@d.com",
        "555-123-4567", "55-123-4567", "555-123-456", "1555-123-45678",
        "word", "w.rd-", "%+-", "a_b@c.d.ee", "12.34", "-", ".",
    ]
    texts = [
        " ".join(rng.choice(tokens) for _ in range(rng.randint(0, 14)))
        for _ in range(120)
    ]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    scrub = F.regexp_replace(
        F.regexp_replace("t", PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
    )
    got = {
        r["i"]: (r["ne"], r["np"], r["s"])
        for r in sdf.select(
            "i",
            F.size(F.regexp_extract_all("t", F.lit(PII_EMAIL), 0)).alias("ne"),
            F.size(F.regexp_extract_all("t", F.lit(PII_PHONE), 0)).alias("np"),
            scrub.alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        ne, np_, s = con.execute(
            "SELECT len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?)),"
            " regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g')",
            [t, PII_EMAIL, t, PII_PHONE, t, PII_EMAIL, PII_PHONE],
        ).fetchone()
        assert got[i] == (ne, np_, s), (i, t, got[i], (ne, np_, s))


def test_bpe_top_merges_match_python_reference(spark, sf_dir):
    """The iteration-1 BPE merge table equals a brute-force Python recount
    over the same whitespace-split words (frequency-weighted overlapping
    adjacent pairs, ties by pair text)."""
    import re

    from vector_db_from_scratch_spark.operators.textops import bpe_top_merges
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = bpe_top_merges(spark, sf_dir, top_n=20).collect()
    texts = [r["text"] for r in load_table(spark, sf_dir, "documents").collect()]
    counts = Counter()
    for text in texts:
        for word in re.split(r"\s+", text):
            if len(word) >= 2:
                for i in range(len(word) - 1):
                    counts[word[i : i + 2]] += 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["pair"], r["n"]) for r in rows] == expect


def test_bpe_train_matches_python_trainer(spark, sf_dir):
    """The N-merge training loop equals a brute-force Python BPE trainer
    (greedy left-to-right merge application, frequency-weighted pair
    counts, ties by pair text) at every iteration -- winner AND count."""
    import re

    from vector_db_from_scratch_spark.operators.textops import (
        BPE_TRAIN_MERGES,
        bpe_train_merges,
    )
    from vector_db_from_scratch_spark.sources.tables import load_table

    rows = bpe_train_merges(spark, sf_dir).collect()
    texts = [r["text"] for r in load_table(spark, sf_dir, "documents").collect()]
    wf = Counter()
    for text in texts:
        for word in re.split(r"\s+", text):
            if len(word) >= 2 and "\x01" not in word:
                wf[tuple(word)] += 1

    def merge_word(syms, pair):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    expect = []
    for _ in range(BPE_TRAIN_MERGES):
        counts = Counter()
        for syms, freq in wf.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq
        pair, n = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        expect.append((f"{pair[0]} {pair[1]}", n))
        merged = Counter()
        for s, f in wf.items():
            merged[merge_word(s, pair)] += f
        wf = merged
    assert [(r["merge"], r["n"]) for r in rows] == expect


def test_bpe_train_end_boundary_adversarial(spark, tmp_path):
    """Regression for the merge-apply END boundary: applying winner (e,l)
    to 'h e ll o' must NOT consume the first l of the 'll' symbol. With
    the corpus llll*8 / xel*12 / hello*9 the buggy replace (pair matched
    without a trailing boundary) corrupts hello to 'h ell o' and flips the
    iteration-4 winner from ('e ll', 9) to ('ell o', 9); the fixed
    space-terminated encoding yields the textbook greedy-BPE trajectory.
    Oracle cross-check included (same parquet through DuckDB)."""
    import duckdb

    from vector_db_from_scratch_spark.operators.textops import (
        bpe_train_merges,
        bpe_train_merges_oracle,
    )

    texts = ["llll"] * 8 + ["xel"] * 12 + ["hello"] * 9
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame([(t,) for t in texts], "text string").coalesce(
        1
    ).write.parquet(path)
    rows = bpe_train_merges(spark, str(tmp_path)).collect()
    got = [(r["merge"], r["n"]) for r in rows]
    assert got == [("l l", 33), ("e l", 12), ("x el", 12), ("e ll", 9)]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')")
    assert [(m, n) for _, m, n in con.execute(bpe_train_merges_oracle()).fetchall()] == got


def test_tokenize_trained_bpe_composition(spark, tmp_path):
    """Train -> apply composition on the adversarial corpus: after the 4
    trained merges (l l), (e l), (x el), (e ll) the tokenization is
    llll -> [ll, ll], xel -> [xel], hello -> [h, ell, o]."""
    from vector_db_from_scratch_spark.operators.textops import tokenize_trained_bpe

    texts = ["llll"] * 8 + ["xel"] * 12 + ["hello"] * 9
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.parquet(path)
    rows = tokenize_trained_bpe(spark, str(tmp_path)).collect()
    expect = {i: {"llll": 2, "xel": 1, "hello": 3}[t] for i, t in enumerate(texts)}
    assert {r["doc_id"]: r["n_tokens"] for r in rows} == expect
    assert all(r["n_words"] == 1 for r in rows)


def test_bigram_lm_matches_python_reference(spark, tmp_path):
    """Add-one bigram LM scores == a driver-side Python reference using
    the same micro-unit contract (round(ln p, 6) -> round-to-nearest
    BIGINT micros, integer per-doc sums, one final division). The corpus
    mixes repeated fluent docs with one word-salad doc so ordering is
    meaningful: the salad's unseen-context bigrams are heavily smoothed
    and it must rank at the bottom."""
    from vector_db_from_scratch_spark.operators.textops import bigram_lm_scores

    texts = (
        ["the cat sat on the mat"] * 6
        + ["the dog sat on the rug"] * 5
        + ["the cat saw the dog"] * 4
        + ["rug mat saw dog the"]  # salad: real words, unseen transitions
    )
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.parquet(path)

    # Python reference
    bigrams: Counter = Counter()
    ctx: Counter = Counter()
    vocab = set()
    for t in texts:
        ws = t.split(" ")
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] += 1
            ctx[a] += 1
    V = len(vocab)
    logp_u = {
        bg: round(round(math.log((c + 1) / (ctx[bg[0]] + V)), 6) * 1_000_000)
        for bg, c in bigrams.items()
    }
    expect = {}
    for i, t in enumerate(texts):
        ws = t.split(" ")
        us = [logp_u[(a, b)] for a, b in zip(ws, ws[1:])]
        expect[i] = (len(us), (sum(us) / 1_000_000) / len(us))

    rows = bigram_lm_scores(spark, str(tmp_path), k=len(texts)).collect()
    got = {r["doc_id"]: (r["n_big"], r["avg_logp"]) for r in rows}
    assert set(got) == set(expect)
    for i in expect:
        assert got[i][0] == expect[i][0]
        assert got[i][1] == expect[i][1], (i, got[i], expect[i])
    # the word-salad doc scores strictly worst
    worst = min(expect, key=lambda i: expect[i][1])
    assert worst == len(texts) - 1
    assert rows[0]["doc_id"] == worst  # bottom-k ordering surfaces it first


def test_bpe_fertility_consistent_with_tokenize(spark, sf_dir):
    """The per-language rollup and the per-document tokenization apply
    the same trained vocab: corpus-total words and tokens must agree,
    and both ratios must be > 0 with chars_per_token >= 1 (a BPE symbol
    holds at least one char)."""
    from vector_db_from_scratch_spark.operators.textops import (
        bpe_fertility,
        tokenize_trained_bpe,
    )

    fert = bpe_fertility(spark, sf_dir).collect()
    tok = tokenize_trained_bpe(spark, sf_dir).collect()
    assert sum(r["n_words"] for r in fert) == sum(r["n_words"] for r in tok)
    assert sum(r["n_tokens"] for r in fert) == sum(r["n_tokens"] for r in tok)
    for r in fert:
        assert r["tokens_per_word"] > 0
        assert r["chars_per_token"] >= 1.0, r["lang"]


def test_source_kl_matches_python_and_is_nonnegative(spark, tmp_path):
    """Per-source KL == a Python reference using the same micro-unit
    contract on a constructed corpus with one on-blend and one
    drifted source; KL >= 0 up to quantization (error bound: one
    micro-unit per token position)."""
    from vector_db_from_scratch_spark.operators.textops import source_kl_divergence

    rows_in = (
        [("the cat sat", "web")] * 8
        + [("the dog ran", "web")] * 8
        + [("zz qq zz qq", "spam")] * 4  # drifted vocabulary
    )
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows_in)],
        "doc_id long, text string, source string",
    ).coalesce(1).write.parquet(path)

    from collections import Counter

    tok_by_source: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for t, s in rows_in:
        for w in t.split(" "):
            tok_by_source.setdefault(s, Counter())[w] += 1
            corpus[w] += 1
    total_c = sum(corpus.values())

    def u(c, tot):
        return round(round(math.log(c / tot), 6) * 1_000_000)

    expect = {}
    for s, cnts in tok_by_source.items():
        total_s = sum(cnts.values())
        sum_u = sum(
            c * (u(c, total_s) - u(corpus[w], total_c)) for w, c in cnts.items()
        )
        expect[s] = (total_s, (sum_u / 1_000_000) / total_s)

    got = {r["source"]: (r["n_tokens"], r["kl_nats"]) for r in
           source_kl_divergence(spark, str(tmp_path)).collect()}
    assert got == expect
    for s, (_, kl) in got.items():
        assert kl >= -1e-6, s  # non-negative up to micro-unit quantization
    # the drifted source diverges more than the on-blend one
    assert got["spam"][1] > got["web"][1]
