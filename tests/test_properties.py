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


# -- round-5 exactness specs (Bloom / CMS / HLL / perceptual hashes) ---------


def _cms_pos_py(key: str, i: int, width: int = 64) -> int:
    import hashlib

    return int(hashlib.md5(f"cms{i}:{key}".encode()).hexdigest()[:15], 16) % width


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=150))
@settings(max_examples=150)
def test_cms_one_sided_overcount(values):
    """CMS point estimates never undercount, under the repo's md5
    position spec (narrow width=64 to force collisions)."""
    from collections import Counter

    depth, width = 4, 64
    cells = [[0] * width for _ in range(depth)]
    for v in values:
        for i in range(depth):
            cells[i][_cms_pos_py(str(v), i, width)] += 1
    truth = Counter(str(v) for v in values)
    for k, t in truth.items():
        est = min(cells[i][_cms_pos_py(k, i, width)] for i in range(depth))
        assert est >= t, k


@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=300))
@settings(max_examples=100, deadline=None)  # first call imports the ladder
def test_hll_is_a_set_estimator(keys):
    """Duplicates never move an HLL estimate (register maxes are
    idempotent) — the property that makes it a DISTINCT counter."""
    from tests.test_sketches import _ref_hll

    vals = [str(k) for k in keys]
    assert _ref_hll(vals) == _ref_hll(vals + vals) == _ref_hll(sorted(vals) * 3)


@given(st.integers(min_value=0, max_value=2**32))
@settings(max_examples=150)
def test_dhash_brightness_invariant_and_local(seed):
    """dHash is invariant to uniform brightness shifts and a single
    pixel edit flips at most its two adjacent comparisons."""
    import numpy as np

    from e_commerce_lakehouse_spark.operators.multimodal import dhash_bits

    rng = np.random.default_rng(seed)
    g = rng.integers(10, 200, size=(8, 9), dtype=np.int64)
    assert dhash_bits(g) == dhash_bits(g + 40)
    r, c = int(rng.integers(0, 8)), int(rng.integers(0, 9))
    g2 = g.copy()
    g2[r, c] = int(rng.integers(0, 256))
    diff = (dhash_bits(g) ^ dhash_bits(g2)) & ((1 << 64) - 1)
    assert bin(diff).count("1") <= 2


@given(st.integers(min_value=0, max_value=2**32), st.integers(min_value=1, max_value=7))
@settings(max_examples=100)
def test_audio_envelope_gain_invariant(seed, gain):
    import numpy as np

    from e_commerce_lakehouse_spark.operators.multimodal import audio_envelope_bits

    rng = np.random.default_rng(seed)
    x = rng.integers(-3000, 3000, size=65 * 8).astype(np.int64)
    assert audio_envelope_bits(x * gain, 65) == audio_envelope_bits(x, 65)


def test_ewma_matches_python_model(spark):
    """windows.ewma == the k-term truncated integer spec computed by a
    driver-side model, including the renormalized series head and
    per-partition independence."""
    from e_commerce_lakehouse_spark.operators import windows as win

    series = {
        "a": [100, 200, 50, 400, 400, 400, 400, 400, 400, 1000, 0, 7],
        "b": [5],
        "c": [10, 10, 10],
    }
    rows = [
        (g, t, v) for g, vals in series.items() for t, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["g", "t", "v"])
    got = {
        (r.g, r.t): r.ewma_v
        for r in win.ewma(df, "v", ["t"], partition_cols=["g"]).collect()
    }

    w, partial = win.ewma_weights()
    k = len(w)
    for g, vals in series.items():
        for t in range(len(vals)):
            m = min(t + 1, k)
            num = sum(w[i] * vals[t - i] for i in range(m))
            assert got[(g, t)] == num // partial[m - 1], (g, t)


def test_ohlc_resample_semantics_and_plan(spark):
    """OHLC bars: open/close picked by (ts, tiebreak) order including
    equal-timestamp ties; the plan is ONE map-side-combinable groupBy,
    no sort window."""
    from pyspark.sql import functions as F

    from e_commerce_lakehouse_spark.operators import windows as W

    rows = [
        # (event_id, ts, type, value) — two buckets, ties at 10:00:00
        (1, "2024-01-01 10:00:00", "a", 5.0),
        (2, "2024-01-01 10:00:00", "a", 3.0),  # same ts: id 1 is open
        (3, "2024-01-01 10:59:59", "a", 9.0),
        (4, "2024-01-01 11:30:00", "a", 2.0),
        (5, "2024-01-01 10:15:00", "b", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = W.ohlc_resample(df)
    got = {
        (r.window_start.hour, r.event_type): (
            r.n_events, r.open_v, r.high_v, r.low_v, r.close_v
        )
        for r in out.collect()
    }
    assert got[(10, "a")] == (3, 5.0, 9.0, 3.0, 9.0)
    assert got[(11, "a")] == (1, 2.0, 2.0, 2.0, 2.0)
    assert got[(10, "b")] == (1, 7.0, 7.0, 7.0, 7.0)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # no sort-window formulation
    assert "partial_min" in plan or "partial" in plan.lower()  # map-side combine


def test_gap_fill_locf(spark):
    from pyspark.sql import functions as F

    from e_commerce_lakehouse_spark.operators import windows as W

    bars = spark.createDataFrame(
        [
            ("a", "2024-01-01 10:00:00", 2, 5.0),
            ("a", "2024-01-01 11:00:00", 1, 7.0),  # 10:15..10:45 missing
            ("b", "2024-01-01 10:30:00", 3, 1.0),
        ],
        "event_type string, window_start string, n_events long, close_v double",
    ).withColumn("window_start", F.to_timestamp("window_start"))
    out = W.gap_fill_locf(
        bars, "window_start", ["event_type"], ["close_v"], ["n_events"],
        step="15 minutes",
    )
    rows = {
        (r.event_type, r.window_start.strftime("%H:%M")): (
            r.n_events, r.close_v, r._filled
        )
        for r in out.collect()
    }
    # key a: 5 buckets 10:00..11:00; gaps carry 5.0 forward, counts 0
    assert rows[("a", "10:00")] == (2, 5.0, False)
    assert rows[("a", "10:15")] == (0, 5.0, True)
    assert rows[("a", "10:30")] == (0, 5.0, True)
    assert rows[("a", "10:45")] == (0, 5.0, True)
    assert rows[("a", "11:00")] == (1, 7.0, False)
    # key b: single bucket span, nothing generated
    assert rows[("b", "10:30")] == (3, 1.0, False)
    assert len(rows) == 6


def test_event_transitions_markov(spark):
    from pyspark.sql import functions as F

    from e_commerce_lakehouse_spark.operators import windows as W

    rows = [
        # user 1: a -> b -> a -> c ; user 2: b -> b
        (1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "a"), (4, 1, 40, "c"),
        (5, 2, 10, "b"), (6, 2, 20, "b"),
        (7, 3, 10, "z"),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.prob_x1e6)
        for r in W.event_transitions(df).collect()
    }
    assert got == {
        ("a", "b"): (1, 500000),
        ("a", "c"): (1, 500000),
        ("b", "a"): (1, 500000),
        ("b", "b"): (1, 500000),
    }
    # per-from rows sum to <= 1e6 (integer div truncation)
    sums = {}
    for (f_, _), (_, p) in got.items():
        sums[f_] = sums.get(f_, 0) + p
    assert all(v <= 1_000_000 for v in sums.values())
