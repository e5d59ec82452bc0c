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
from collections import Counter

from hypothesis import given, settings, strategies as st

from vector_db_from_scratch_spark.operators.textops import (
    ENTROPY_ALPHABET,
    char_entropy_expr,
)

_DOCS: list[str] = []


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet=ENTROPY_ALPHABET, min_size=1, max_size=40))
def test_collect_docs(s):
    _DOCS.append(s)


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
    docs = sorted(set(_DOCS)) or ["aab", "zzzz", "abc defg"]
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
