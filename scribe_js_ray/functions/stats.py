"""Robust-stat helpers matching the reference's JS semantics exactly.

Ports of quantile/mean50/range from /root/reference/js/utils/miscUtils.js
(106-156, 574-580).  The JS index arithmetic (floor(n*ntile), the
negative-slice behavior of mean50 on short arrays) is preserved because the
extracted-text goldens depend on the same cut decisions the reference makes.
"""

from __future__ import annotations

import math


def quantile(arr, ntile):
    """miscUtils.js:106-118 — sorted[floor(len*ntile)]; None on empty."""
    if not arr:
        return None
    srt = sorted(arr)
    mid = math.floor(len(srt) * ntile)
    if mid >= len(srt):
        mid = len(srt) - 1
    return srt[mid]


def mean50(arr):
    """miscUtils.js:139-151 — mean of the middle 50% (JS slice semantics)."""
    if not arr:
        return None
    n = len(arr)
    per25 = math.floor(n / 4) - 1
    per75 = math.ceil(n * 3 / 4) - 1
    nums = sorted(arr)
    # JS slice(-1, end) == Python [-1:end] for the n>=1 cases that occur here.
    middle = nums[per25:per75 + 1] if per25 >= 0 else nums[-1:per75 + 1]
    if not middle:
        return None
    return sum(middle) / len(middle)


def rangei(lo, hi):
    """miscUtils.js:574-580 — inclusive integer range as a list."""
    return list(range(lo, hi + 1))


def truthy(x):
    """JS truthiness for the numeric/None values used in the heuristics."""
    if x is None or x is False:
        return False
    if isinstance(x, float) and math.isnan(x):
        return False
    return bool(x)


def at(arr, i):
    """JS ``arr[i]`` — None (undefined) when out of range or negative."""
    if i < 0 or i >= len(arr):
        return None
    return arr[i]


def js_round(x):
    """JS Math.round: half-up toward +infinity (differs from Python's
    banker's rounding; miscUtils.js round3/round6 depend on it)."""
    return math.floor(x + 0.5)


def round3(x):
    """miscUtils.js:276-282."""
    return js_round(x * 1e3) / 1e3


def round6(x):
    """miscUtils.js:290-296."""
    return js_round(x * 1e6) / 1e6


def js_hypot(a, b):
    """V8's Math.hypot: max-normalized Neumaier-compensated sum of squares,
    then sqrt * max — NOT correctly rounded like Python's math.hypot, and
    the two disagree in the last ulp for ~35% of inputs (measured), so the
    byte-parity surfaces must reproduce V8's result exactly."""
    a, b = abs(a), abs(b)
    if a == 0 and b == 0:
        return 0.0
    m = a if a > b else b
    if m != m or m == math.inf:
        return m
    xa, xb = a / m, b / m
    s = 0.0
    comp = 0.0
    for x in (xa, xb):
        sq = x * x
        t = s + sq
        if abs(s) >= abs(sq):
            comp += (s - t) + sq
        else:
            comp += (sq - t) + s
        s = t
    return math.sqrt(s + comp) * m
