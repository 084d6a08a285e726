"""Compiled expressions: grammar whitelist, vectorized evaluation, and the
score-by-formula pipeline."""

import numpy as np
import pytest

from lucene_ray.search.expressions import compile_expression


def test_basic_arithmetic():
    e = compile_expression("2 * a + b / 4 - 1")
    out = e.evaluate({"a": np.array([1.0, 2.0]), "b": np.array([4.0, 8.0])})
    np.testing.assert_allclose(out, [2.0, 5.0])
    assert e.variables == ["a", "b"]


def test_functions_and_power():
    e = compile_expression("sqrt(x) + log(y) + pow(x, 2) + max(x, y)")
    x = np.array([4.0, 9.0])
    y = np.array([1.0, np.e])
    out = e.evaluate({"x": x, "y": y})
    np.testing.assert_allclose(out, np.sqrt(x) + np.log(y) + x**2 + np.maximum(x, y))


def test_comparisons_as_indicators():
    e = compile_expression("(a > 2) * 10 + (a <= 2)")
    out = e.evaluate({"a": np.array([1.0, 3.0])})
    np.testing.assert_allclose(out, [1.0, 10.0])


def test_scalar_broadcast_and_unary():
    e = compile_expression("-a + 0.5")
    np.testing.assert_allclose(e.evaluate({"a": np.array([1.0])}), [-0.5])


def test_rejects_unsafe_syntax():
    for bad in [
        "__import__('os')",
        "a.b",
        "a[0]",
        "lambda: 1",
        "f(1)",
        "'str'",
        "a if b else c",
    ]:
        with pytest.raises((ValueError, SyntaxError)):
            compile_expression(bad)


def test_unbound_variable_raises():
    e = compile_expression("a + b")
    with pytest.raises(KeyError):
        e.evaluate({"a": np.array([1.0])})
