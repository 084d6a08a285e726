"""DynamicRangeUtil port — equi-weight dynamic numeric ranges
(lucene/facet/src/java/org/apache/lucene/facet/range/DynamicRangeUtil.java)."""

import numpy as np
import pytest

from lucene_ray.pipelines.fulltext import compute_dynamic_numeric_ranges


def java_loop_oracle(values, weights, top_n):
    """Literal transcription of computeDynamicNumericRanges's loop
    (DynamicRangeUtil.java:236-266)."""
    n = len(values)
    if n == 0 or top_n == 0:
        return []
    idx = sorted(range(n), key=lambda i: (values[i], weights[i]))
    v = [values[i] for i in idx]
    w = [weights[i] for i in idx]
    total = sum(w)
    target = total / min(top_n, n)
    out = []
    accu = vsum = count = 0
    min_idx = 0
    for i in range(n):
        accu += w[i]
        vsum += v[i]
        count += 1
        if accu >= target:
            out.append((count, accu, v[min_idx], v[i], vsum / count))
            accu = vsum = count = 0
            min_idx = i + 1
    if min_idx < n:
        out.append((count, accu, v[min_idx], v[n - 1], vsum / count))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("top_n", [1, 3, 5, 17])
def test_matches_java_loop(seed, top_n):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 120))
    values = rng.integers(0, 40, size=n).tolist()
    weights = rng.integers(1, 10, size=n).tolist()
    got = compute_dynamic_numeric_ranges(values, weights, top_n)
    exp = java_loop_oracle(values, weights, top_n)
    assert len(got) == len(exp)
    for g, (count, weight, mn, mx, cen) in zip(got, exp):
        assert (g["count"], g["weight"], g["min"], g["max"]) == (count, weight, mn, mx)
        assert g["centroid"] == pytest.approx(cen)


def test_empty_and_zero_topn():
    assert compute_dynamic_numeric_ranges([], [], 5) == []
    assert compute_dynamic_numeric_ranges([1, 2], [1, 1], 0) == []


def test_single_range():
    out = compute_dynamic_numeric_ranges([5, 1, 3], [1, 1, 1], 1)
    assert out == [{"count": 3, "weight": 3, "min": 1, "max": 5,
                    "centroid": 3.0}]


def test_unit_weight_chunks():
    # 10 items, topN=3 -> target 10/3 -> chunks of 4, 4, 2
    vals = list(range(10))
    out = compute_dynamic_numeric_ranges(vals, [1] * 10, 3)
    assert [r["count"] for r in out] == [4, 4, 2]
    assert [r["min"] for r in out] == [0, 4, 8]
    assert [r["max"] for r in out] == [3, 7, 9]
