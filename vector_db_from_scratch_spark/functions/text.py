"""Text-analysis column expressions over the ``documents`` table, each with a
DuckDB-oracle twin (training-data-pipeline operators: token counting,
quality scoring, language-ID heuristic, document fingerprinting).

All expressions are pure Spark SQL (whole-stage codegen, no Python UDFs) and
deterministic: integer arithmetic or single IEEE divisions on identical
operands in both engines -- no rounding needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import MERSENNE31, hash31_sql

# A small multilingual stopword inventory for the language-ID heuristic.
# On real corpora these discriminate; on any corpus the Spark and oracle
# outputs agree because both run the same scoring + CASE-priority argmax.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is", "in", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "los", "se", "un"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "et"],
    "zh": [],  # scored by CJK character presence instead
}
LANG_PRIORITY = ["de", "en", "es", "fr", "zh"]  # tie-break: first wins

ENGLISH_STOPWORDS = STOPWORDS["en"]

# Character-trigram profiles: the most frequent trigrams of each language
# (public frequency tables; e.g. Cavnar & Trenkle, "N-Gram-Based Text
# Categorization"). Scores = total occurrences of profile trigrams in the
# lowercased text -- real discriminative power on natural corpora, exact
# cross-engine semantics here (replace-based counting is identical in
# Spark and DuckDB). zh is scored by CJK codepoint count instead.
TRIGRAM_PROFILES = {
    "en": [" th", "the", "he ", "ing", "and", " an", "nd ", " of", "of ", "ion"],
    "de": ["en ", "er ", "ch ", "der", " de", "ie ", "ein", "sch", "die", "und"],
    "es": [" de", "de ", "os ", " la", "la ", " el", "el ", "que", " qu", "ión"],
    "fr": [" de", "de ", "es ", " le", "le ", "ent", " la", "la ", "ion", "que"],
    "zh": [],  # CJK codepoint count
}


def tokens(c: Column) -> Column:
    """Whitespace tokenization (single-space split: the one tokenizer whose
    semantics are identical between Spark `split` and DuckDB `str_split`)."""
    return F.split(c, " ")


def token_count(c: Column) -> Column:
    return F.size(tokens(c)).cast("long")


def token_count_sql(expr: str) -> str:
    return f"len(str_split({expr}, ' '))"


def stopword_count(c: Column, words: list[str]) -> Column:
    lit = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(c), lambda t: F.array_contains(lit, t))).cast("long")


def stopword_count_sql(expr: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(str_split({expr}, ' '), t -> list_contains([{lst}], t)))"


def distinct_stopword_count(c: Column, words: list[str]) -> Column:
    lit = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(F.array_distinct(tokens(c)), lit)).cast("long")


def distinct_stopword_count_sql(expr: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_intersect(list_distinct(str_split({expr}, ' ')), [{lst}]))"


def cjk_char_count(c: Column) -> Column:
    return F.length(F.regexp_replace(c, "[^一-鿿]", "")).cast("long")


def cjk_char_count_sql(expr: str) -> str:
    return f"length(regexp_replace({expr}, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g'))"


def trigram_score(c: Column, trigrams: list[str]) -> Column:
    """Total (non-overlapping) occurrences of the profile trigrams in the
    lowercased text: sum of (len - len(replace(t, tri))) / 3. Exact integer
    arithmetic, identical replace semantics in both engines."""
    lt = F.lower(c)
    score = F.lit(0).cast("long")
    for tri in trigrams:
        cnt = (F.length(lt) - F.length(F.replace(lt, F.lit(tri), F.lit("")))) / F.lit(3)
        score = score + cnt.cast("long")
    return score


def trigram_score_sql(expr: str, trigrams: list[str]) -> str:
    terms = [
        f"CAST((length(lower({expr})) - length(replace(lower({expr}), '{tri}', ''))) / 3 AS BIGINT)"
        for tri in trigrams
    ]
    return "(" + " + ".join(terms) + ")"


def fingerprint(c: Column) -> Column:
    """Order-sensitive document fingerprint: sum_i i * h31(token_i).

    Position-weighted so reordered tokens change the fingerprint (the
    rolling-hash property we need), yet expressible without a list fold --
    DuckDB has no reduce/fold, so the oracle uses an index-transform sum.
    Bounded by 2^31 * n^2 (fits int64 for n < ~46k tokens).
    """
    toks = tokens(c)
    weighted = F.transform(
        toks,
        lambda t, i: (i + F.lit(1).cast("long"))
        * (F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % MERSENNE31),
    )
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)


def fingerprint_sql(expr: str) -> str:
    t = f"str_split({expr}, ' ')"
    return (
        f"list_sum(list_transform(range(1, len({t}) + 1), "
        f"i -> i * {hash31_sql(f'{t}[i]')}))::BIGINT"
    )
