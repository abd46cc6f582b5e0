"""Property-based tests (hypothesis) over the engine's pure kernels —
a layer the reference's test suite lacks entirely (SURVEY.md §5: "No
property-based testing").  All properties are Ray-free and fast."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dygiepp_ray.core import stable_bucket
from dygiepp_ray.semantics import (
    distance_bucket,
    dynamic_k,
    enumerate_spans,
    prune_topk_resort,
    softmax_with_dummy,
)
from dygiepp_ray.sources.apf import _snap, _tok_spans


# ---------------------------------------------------------------------------
# stable_bucket: the partitioning contract every exchange relies on
# ---------------------------------------------------------------------------

keys = st.lists(
    st.one_of(st.integers(-2**40, 2**40), st.text(max_size=12)),
    min_size=1, max_size=50,
)


@given(keys, st.integers(1, 64))
@settings(max_examples=50, deadline=None)
def test_stable_bucket_range_and_value_determinism(vals, nb):
    vals = [str(v) for v in vals]  # one dtype per column, like real keys
    b = stable_bucket(vals, nb)
    assert ((b >= 0) & (b < nb)).all()
    # bucket is a pure function of the VALUE: position and neighborhood
    # must not matter (rows may arrive in any block order)
    rev = stable_bucket(vals[::-1], nb)
    assert (b[::-1] == rev).all()
    one = stable_bucket([vals[0]], nb)
    assert one[0] == b[0]


# ---------------------------------------------------------------------------
# APF char->token snapping
# ---------------------------------------------------------------------------

texts = st.text(alphabet=" ab\n", min_size=1, max_size=40)


@given(texts)
@settings(max_examples=100, deadline=None)
def test_snap_exact_alignment_never_reports_snapped(text):
    tokens, starts, ends = _tok_spans(text)
    for i in range(len(tokens)):
        for j in range(i, len(tokens)):
            hit = _snap(starts, ends, int(starts[i]), int(ends[j]) - 1)
            assert hit == (i, j, False)


@given(texts, st.data())
@settings(max_examples=100, deadline=None)
def test_snap_result_covers_extent(text, data):
    tokens, starts, ends = _tok_spans(text)
    if len(tokens) == 0:
        return
    s = data.draw(st.integers(0, len(text) - 1))
    e = data.draw(st.integers(s, len(text) - 1))
    hit = _snap(starts, ends, s, e)
    if hit is None:  # extent wholly in whitespace / outside tokens
        assert text[s:e + 1].strip() == ""
        return
    i, j, _sn = hit
    assert 0 <= i <= j < len(tokens)
    # every non-space char of the extent lies inside the token cover
    for pos in range(s, e + 1):
        if not text[pos].isspace():
            assert starts[i] <= pos < ends[j]


# ---------------------------------------------------------------------------
# decode-convention kernels (F6 / O1 / O2)
# ---------------------------------------------------------------------------

@given(
    st.lists(st.floats(-20, 20, allow_nan=False), min_size=1, max_size=12),
    st.integers(1, 12),
)
@settings(max_examples=100, deadline=None)
def test_prune_topk_resort_vs_bruteforce(scores, k):
    # break ties deterministically like the engine's strict ordering
    scores = [s + i * 1e-9 for i, s in enumerate(scores)]
    got = prune_topk_resort(scores, k)
    kk = min(k, len(scores))
    want = sorted(sorted(range(len(scores)),
                         key=lambda i: (-scores[i], i))[:kk])
    assert got == want
    assert got == sorted(got)  # O1: re-sorted by original index


@given(st.lists(st.floats(-30, 30, allow_nan=False), min_size=1, max_size=10))
@settings(max_examples=100, deadline=None)
def test_softmax_with_dummy_conventions(raw):
    ix, raw_score, sm = softmax_with_dummy(raw)
    # index is over [dummy=0] + raw (0 = null class); ties -> first max,
    # matching np.argmax
    full = np.array([0.0] + raw)
    assert ix == int(np.argmax(full))
    assert 0.0 <= sm <= 1.0
    assert raw_score == full[ix]
    if ix >= 1:
        assert raw_score == raw[ix - 1]


@given(st.integers(0, 500), st.floats(0.01, 2.0), st.integers(0, 5000))
@settings(max_examples=100, deadline=None)
def test_dynamic_k_bounds(n_tokens, spw, n_spans):
    k = dynamic_k(n_tokens, spw, n_spans)
    assert 0 <= k <= n_spans
    assert dynamic_k(n_tokens, spw, n_spans, cap=7) <= 7


@given(st.integers(0, 10000))
@settings(max_examples=100, deadline=None)
def test_distance_bucket_monotone_bounded(d):
    b = distance_bucket(d)
    assert 0 <= b <= 9
    assert distance_bucket(d + 1) >= b


@given(st.integers(0, 40), st.integers(1, 10))
@settings(max_examples=60, deadline=None)
def test_enumerate_spans_complete(n, w):
    spans = enumerate_spans(n, w)
    want = [(i, j) for i in range(n) for j in range(i, min(i + w, n))]
    assert sorted(spans) == sorted(want)
    assert len(set(spans)) == len(spans)
