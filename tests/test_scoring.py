"""Scoring goldens — mirrors the reference's LogDiceUtilsTest exactly.

Golden values from ``src/test/java/.../utils/LogDiceUtilsTest.java:22-60``
(perfect association = 14.0; zero joint freq = 0.0; nonpositive corpus
freqs raise).
"""

import math

import pytest

from word_sketch_lucene_spark.functions.scoring import (
    bm25_score_py,
    bm25_upper_bound_py,
    logdice_py,
)


def test_logdice_perfect_association():
    assert logdice_py(100, 100, 100) == 14.0


def test_logdice_zero_joint():
    assert logdice_py(0, 1000, 1000) == 0.0


def test_logdice_clamped_nonnegative():
    # extremely weak association would be negative pre-clamp
    assert logdice_py(1, 10**9, 10**9) == 0.0


@pytest.mark.parametrize("fa,fb", [(0, 10), (10, 0), (-1, 10), (10, -5)])
def test_logdice_nonpositive_raises(fa, fb):
    with pytest.raises(ValueError):
        logdice_py(5, fa, fb)


def test_logdice_known_value():
    # logDice(50, 100, 100) = log2(100/200) + 14 = 13.0
    assert math.isclose(logdice_py(50, 100, 100), 13.0)


def test_bm25_formula_golden():
    # hand-computed: tf=2, df=5, dl=10, N=100, avgdl=10
    idf = math.log(1 + (100 - 5 + 0.5) / (5 + 0.5))
    tfn = 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 10 / 10))
    assert math.isclose(bm25_score_py(2, 5, 10, 100, 10), idf * tfn, rel_tol=1e-12)


def test_bm25_upper_bound_dominates():
    # the tf→∞ bound must dominate any achievable score
    for tf in (1, 2, 5, 100, 10**6):
        for dl in (1, 10, 1000):
            s = bm25_score_py(tf, 5, dl, 100, 10)
            assert s <= bm25_upper_bound_py(5, 100) + 1e-12
