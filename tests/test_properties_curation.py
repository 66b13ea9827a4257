"""Property-based tests (hypothesis) for the session-5 curation math.

Driver-side mirrors of the exact-integer formulas the Spark operators
and their SQL oracles both implement (waterfilling prefix test, Wilson
interval, S-curve ppm fold) — the Spark side equals these by the unit
tests + hash gates, so properties proven here transfer. Same style as
test_properties.py."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# pure-python mirrors (exact integer arithmetic, same as operators/*.py)
# ---------------------------------------------------------------------------


def waterfill_closed_form(src, budget):
    """Mirror of operators/mixer.py:waterfill_allocation's per-row test —
    exact cross-multiplied ratio ordering, exact saturation inequality."""
    rows = sorted(src, key=_ratio_key(src))
    w_total = sum(w for _, _, w in src)
    out = {}
    a_prefix = 0
    w_prefix = 0
    for k, a, w in rows:
        w_suffix = w_total - w_prefix
        saturated = a * w_suffix <= (budget - a_prefix) * w
        out[k] = saturated
        a_prefix += a
        w_prefix += w
    a_sat = sum(a for k, a, w in src if out[k])
    w_unsat = sum(w for k, a, w in src if not out[k])
    alloc = {}
    r = (budget - a_sat) * 1_000_000 // w_unsat if w_unsat else None
    for k, a, w in src:
        alloc[k] = a if out[k] else r * w // 1_000_000
    return alloc, out


def _ratio_key(src):
    import functools

    def cmp(x, y):
        lhs, rhs = x[1] * y[2], y[1] * x[2]
        if lhs != rhs:
            return -1 if lhs < rhs else 1
        return -1 if x[0] < y[0] else (1 if x[0] > y[0] else 0)

    return functools.cmp_to_key(cmp)


def waterfill_iterative(src, budget):
    """The classic peel-the-saturated-set loop (reference algorithm).

    The saturation test is EXACT-rational (a * w_tot <= remaining * w),
    matching the operator: a ppm-floored test diverges at exact
    boundaries (e.g. a=1, w=3, budget=1: floor(1e6/3)*3//1e6 = 0 < 1
    marks the source unsaturated and strands budget the exact form
    allocates) — a real hypothesis catch, kept as a regression note."""
    live = {k: (a, w) for k, a, w in src}
    remaining = budget
    alloc = {}
    while live:
        w_tot = sum(w for _, w in live.values())
        newly = [k for k, (a, w) in live.items() if a * w_tot <= remaining * w]
        if not newly:
            r = remaining * 1_000_000 // w_tot
            for k, (a, w) in live.items():
                alloc[k] = r * w // 1_000_000
            return alloc
        for k in newly:
            a, w = live.pop(k)
            alloc[k] = a
            remaining -= a
    return alloc


def wilson(k, n, z=1.96, sign=1):
    p = k / n
    return (
        (p + z * z / (2 * n))
        + sign * (z * math.sqrt((p * (1 - p)) / n + z * z / (4 * n * n)))
    ) / (1 + z * z / n)


def p_at_t_ppm(tr_ppm, b):
    """Mirror of the (1-t^r)^b left floor-fold in plan_bands."""
    acc = 1_000_000
    q = 1_000_000 - tr_ppm
    for _ in range(b):
        acc = acc * q // 1_000_000
    return 1_000_000 - acc


# ---------------------------------------------------------------------------
# properties
# ---------------------------------------------------------------------------

sources = st.lists(
    st.tuples(
        st.integers(0, 9),  # key suffix
        st.integers(1, 10_000),  # avail
        st.integers(1, 500),  # weight
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
).map(lambda rows: [(f"s{k}", a, w) for k, a, w in rows])


@settings(max_examples=300, deadline=None)
@given(sources, st.integers(0, 60_000))
def test_waterfill_closed_form_equals_iterative(src, budget):
    closed, _ = waterfill_closed_form(src, budget)
    iterative = waterfill_iterative(src, budget)
    assert closed == iterative


@settings(max_examples=300, deadline=None)
@given(sources, st.integers(0, 60_000))
def test_waterfill_feasible_and_exhaustive(src, budget):
    alloc, sat = waterfill_closed_form(src, budget)
    supply = {k: a for k, a, _ in src}
    # never over-allocate a source or the budget
    assert all(0 <= alloc[k] <= supply[k] for k in alloc)
    total_supply = sum(supply.values())
    if budget >= total_supply:
        # budget exceeds supply: everything taken whole
        assert sum(alloc.values()) == total_supply
    else:
        # floor slack only: within |sources| tokens of the budget
        assert budget - len(src) * 2 <= sum(alloc.values()) <= budget


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 10_000))
def test_wilson_brackets_point_estimate(k, n):
    k = min(k, n)
    lb, ub = wilson(k, n, sign=-1), wilson(k, n, sign=1)
    # 1-ulp slack: at p=1 the exact ub is 1.0 but the float evaluation
    # lands a hair under (0.9999999999999998) — shared by both engines
    # (identical op order), so the gate is unaffected
    eps = 1e-12
    assert lb - eps <= k / n <= ub + eps
    assert 0 <= ub - lb <= 1 + eps


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 99))
def test_wilson_tightens_with_evidence(pct):
    # same observed rate, 100x the sample: interval must shrink and the
    # lower bound must rise — the anti-2-out-of-2 property the gate uses
    small = wilson(pct, 100, sign=-1)
    big = wilson(pct * 100, 10_000, sign=-1)
    assert big > small


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 999_999), st.integers(1, 120))
def test_p_at_t_fold_bounded_and_monotone(tr_ppm, b):
    p = p_at_t_ppm(tr_ppm, b)
    assert 0 <= p <= 1_000_000
    if b > 1:
        assert p >= p_at_t_ppm(tr_ppm, b - 1)  # more bands, more collisions
