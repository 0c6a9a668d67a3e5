"""Hypothesis property tests for the determinism primitives — these are
the invariants the oracle gate rests on, so they get fuzzed directly
(driver-side math mirrors of the Column expressions)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# mirrors of functions/money.py and operators/similarity.py expressions


def cents_py(x: float) -> int:
    return math.floor(x * 100.0 + 0.5)


def quant_py(x: float) -> int:
    return math.floor(float(x) * 1000000.0 + 0.5)


@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False))
@settings(max_examples=300)
def test_cents_roundtrip_within_half_cent(x):
    c = cents_py(x)
    assert abs(c / 100.0 - x) <= 0.005 + 1e-9


@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=200)
)
@settings(max_examples=200)
def test_cents_sum_order_independent(xs):
    # the whole point: integer cents sum identically in any order
    fwd = sum(cents_py(x) for x in xs)
    rev = sum(cents_py(x) for x in reversed(xs))
    assert fwd == rev


@given(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False))
@settings(max_examples=300)
def test_quantization_monotone(x):
    eps = 1e-5
    assert quant_py(x) <= quant_py(x + eps)


@given(
    st.sets(st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=30),
    st.sets(st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=30),
)
@settings(max_examples=200)
def test_jaccard_bounds_and_symmetry(a, b):
    inter = len(a & b)
    union = len(a) + len(b) - inter
    j = inter / union
    assert 0.0 <= j <= 1.0
    assert j == len(b & a) / (len(b) + len(a) - len(b & a))
    if a == b:
        assert j == 1.0


@given(st.integers(min_value=0, max_value=2**62), st.integers(min_value=0, max_value=2**62))
@settings(max_examples=200)
def test_hamming_distance_metric(a, b):
    d = bin(a ^ b).count("1")
    assert d == bin(b ^ a).count("1")
    assert (d == 0) == (a == b)
