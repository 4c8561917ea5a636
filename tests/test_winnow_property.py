"""Property-based proof of the winnow selection-key encoding (hypothesis).

operators/winnow.py replaces the textbook robust-winnowing rule — "per
window pick the minimum hash, ties broken toward the RIGHTMOST position"
(Schleimer et al. 2003, §5) — with pure arithmetic so ANSI SQL can
reproduce it: min over ``key = (h mod 2^36)·2^25 + (2^25−1−pos)``.  That
substitution is the one piece neither the Spark/DuckDB parity tests nor
the Spark-vs-Python tests can catch if it is wrong IN BOTH places, so this
file pins it against a direct transcription of the paper's rule, over
hash sequences drawn to collide constantly (tiny value domains).  Pure
Python — no Spark session.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginesimple_spark.operators.winnow import WINNOW_POS_CAP, WINNOW_R_MOD


def _textbook(hashes: list[int], w: int) -> set[int]:
    """Robust winnowing exactly as written: per window of w, the minimum of
    the REDUCED hash (h mod 2^36 — the documented selection domain), ties
    to the rightmost position."""
    n = len(hashes)
    reduced = [h % WINNOW_R_MOD for h in hashes]
    wlen = min(w, n)
    sel = set()
    for q in range(wlen - 1, n):
        window = range(q - wlen + 1, q + 1)
        m = min(reduced[p] for p in window)
        sel.add(max(p for p in window if reduced[p] == m))
    return sel


def _arithmetic(hashes: list[int], w: int) -> set[int]:
    """The engine's rule: min of the packed key per window."""
    n = len(hashes)
    keys = [
        (hashes[p] % WINNOW_R_MOD) * WINNOW_POS_CAP + (WINNOW_POS_CAP - 1 - p)
        for p in range(n)
    ]
    wlen = min(w, n)
    sel = set()
    for q in range(wlen - 1, n):
        key = min(keys[q - wlen + 1 : q + 1])
        sel.add(WINNOW_POS_CAP - 1 - (key % WINNOW_POS_CAP))
    return sel


# tiny domains force constant ties; large values exercise the 62-bit range
_HASHES = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=(1 << 62) - 1),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=500, deadline=None)
@given(hashes=_HASHES, w=st.integers(min_value=1, max_value=9))
def test_arithmetic_key_encodes_rightmost_min(hashes, w):
    assert _arithmetic(hashes, w) == _textbook(hashes, w)


@settings(max_examples=200, deadline=None)
@given(hashes=_HASHES, w=st.integers(min_value=1, max_value=9))
def test_selection_is_local(hashes, w):
    """Winnowing is a LOCAL algorithm (the paper's defining property): the
    selections inside a region depend only on a w-neighbourhood, so
    appending tokens must never change selections that are at least w
    positions from the end.  This is what makes the operator map-side
    safe: a document split across Arrow batches of the staged array can
    never disagree with the whole-array answer."""
    full = _arithmetic(hashes, w)
    prefix = _arithmetic(hashes[:-1], w) if len(hashes) > 1 else set()
    stable = {p for p in range(max(0, len(hashes) - 1 - w))}
    assert {p for p in full if p in stable and p < len(hashes) - 1 - w} == {
        p for p in prefix if p < len(hashes) - 1 - w
    }
