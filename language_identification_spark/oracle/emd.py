"""1-D Earth Mover's Distance with unmatched-point cost (F12).

The metric behind the reference's positional fuzzy matcher
(/root/reference/language_identification/dictionary_langid/datatypes.py:209-341):
given two lists of locations in [0, 1], match points of the shorter list to
distinct points of the longer one; cost = sum of |x - y| over matched pairs
plus 1 per unmatched point of the longer list. The reference defines it by
recursion (drop one point of the longer list for cost 1) with a greedy fast
path cross-checked by assertion; here the same contract is:

- ``emd_1d_slow`` — the defining recursion, memoized (the spec);
- ``emd_1d_fast`` — an O(n*m) alignment DP over the sorted lists: in 1-D an
  optimal matching never crosses, so after sorting, each y_j matches some
  x_i with i strictly increasing — exactly a sequence alignment where
  skipping x_i costs 1 and matching costs |x_i - y_j|;
- ``emd_1d`` — fast path asserted against the spec (the reference's
  fast-vs-slow oracle pattern, datatypes.py:337-341), property-tested.
"""

from __future__ import annotations

from functools import lru_cache


def emd_1d_slow(locations_x: list[float], locations_y: list[float]) -> float:
    """Defining recursion: equal lengths pair up sorted; otherwise dropping
    any one point of the longer list costs 1 (datatypes.py:328-336)."""

    @lru_cache(maxsize=None)
    def rec(xs: tuple[float, ...], ys: tuple[float, ...]) -> float:
        if len(xs) < len(ys):
            return rec(ys, xs)
        if len(xs) == len(ys):
            return sum(abs(a - b) for a, b in zip(sorted(xs), sorted(ys)))
        return 1 + min(rec(xs[:i] + xs[i + 1 :], ys) for i in range(len(xs)))

    return rec(tuple(locations_x), tuple(locations_y))


def emd_1d_fast(locations_x: list[float], locations_y: list[float]) -> float:
    """Alignment DP on the sorted lists (see module docstring)."""
    xs = sorted(locations_x)
    ys = sorted(locations_y)
    if len(xs) < len(ys):
        xs, ys = ys, xs
    n, m = len(xs), len(ys)
    if m == 0:
        return float(n)
    # dp[j] = min cost of aligning xs[:i] with ys[:j] at the current i;
    # transitions: skip x_i (+1) or match x_i<->y_j (+|x_i - y_j|)
    inf = float("inf")
    prev = [0.0] + [inf] * m  # i = 0: no x consumed, j>0 impossible
    for i in range(1, n + 1):
        cur = [prev[0] + 1.0] + [inf] * m
        for j in range(1, m + 1):
            match = prev[j - 1] + abs(xs[i - 1] - ys[j - 1])
            skip = prev[j] + 1.0 if prev[j] < inf else inf
            cur[j] = match if match <= skip else skip
        prev = cur
    return prev[m]


def emd_1d(locations_x: list[float], locations_y: list[float]) -> float:
    """Fast DP cross-checked against the defining recursion (the reference
    asserts the same equivalence at runtime; we keep the assert here because
    both paths are cheap at word length, and property-test it besides)."""
    fast = emd_1d_fast(locations_x, locations_y)
    slow = emd_1d_slow(locations_x, locations_y)
    assert abs(fast - slow) < 1e-5, (fast, slow)
    return fast
