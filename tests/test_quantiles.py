"""Distributed exact quantiles (ops/quantiles.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(vals, q, decimals=2):
    """Discrete quantile of half-away-from-zero-rounded values."""
    import decimal

    r = sorted(
        float(decimal.Decimal(repr(v)).quantize(
            decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP))
        for v in vals
    )
    n = len(r)
    return r[max(1, math.ceil(q * n)) - 1]


def test_value_quantiles_vs_python_oracle(ray_session):
    import pyarrow.parquet as pq

    import ray.data

    from lucene_ray.ops.quantiles import value_quantiles

    ds = ray.data.read_parquet(f"{SF}/events.parquet")
    got = value_quantiles(ds, "value")
    vals = pq.read_table(f"{SF}/events.parquet", columns=["value"]) \
        .column("value").to_pylist()
    for q, v in zip(got.column("q").to_pylist(), got.column("value").to_pylist()):
        assert v == pytest.approx(_oracle(vals, q), abs=1e-9), q


def test_value_quantiles_small_synthetic(ray_session):
    import ray.data

    from lucene_ray.ops.quantiles import value_quantiles

    t = pa.table({"value": pa.array([3.0, 1.0, 2.0, 2.0, 10.0], pa.float64())})
    got = value_quantiles(ray.data.from_arrow(t), "value", qs=(0.2, 0.5, 1.0))
    assert got.column("value").to_pylist() == [1.0, 2.0, 10.0]


def test_value_quantiles_single_row(ray_session):
    import ray.data

    from lucene_ray.ops.quantiles import value_quantiles

    t = pa.table({"value": pa.array([7.125], pa.float64())})
    got = value_quantiles(ray.data.from_arrow(t), "value", qs=(0.01, 0.99))
    # 7.125 rounds half-away to 7.13
    assert got.column("value").to_pylist() == [7.13, 7.13]


def test_grouped_median_matches_global_on_one_group(ray_session):
    import ray.data

    from lucene_ray.ops.quantiles import grouped_value_quantiles, value_quantiles

    t = pa.table({
        "g": pa.array(["a"] * 7, pa.string()),
        "value": pa.array([5.0, 1.0, 9.0, 3.0, 3.0, 2.0, 8.0], pa.float64()),
    })
    grouped = grouped_value_quantiles(ray.data.from_arrow(t), "g", "value", 0.5)
    glob = value_quantiles(ray.data.from_arrow(t), "value", qs=(0.5,))
    assert grouped.column("value").to_pylist() == glob.column("value").to_pylist()
    assert grouped.column("g").to_pylist() == ["a"]


def test_grouped_median_per_group(ray_session):
    import ray.data

    from lucene_ray.ops.quantiles import grouped_value_quantiles

    t = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 10.0, 20.0], pa.float64()),
    })
    got = grouped_value_quantiles(ray.data.from_arrow(t), "g", "value", 0.5)
    assert got.column("g").to_pylist() == ["a", "b"]
    assert got.column("value").to_pylist() == [2.0, 10.0]
