"""Compiled arithmetic expressions over doc values and ``_score`` — the
lucene/expressions module analog
(lucene/expressions/src/java/org/apache/lucene/expressions/js/JavascriptCompiler.java:105):
a formula string compiles once into a vectorized numpy evaluator bound to
named columns (DoubleValuesSource semantics), usable for score-by-formula
and sort-by-formula.

Grammar (Python ``ast`` subset, whitelisted):
    literals, variables, + - * / % **, unary -, comparisons (as 0/1),
    functions: sqrt, log, log10, ln, abs, min, max, pow.
Variables resolve against the binding dict at evaluate time (e.g. doc-value
columns, ``_score``). Everything evaluates in float64.
"""

from __future__ import annotations

import ast

import numpy as np

_FUNCS = {
    "sqrt": np.sqrt,
    "log": lambda x: np.log(x),  # JS-expr ln; Lucene's log is natural too
    "ln": np.log,
    "log10": np.log10,
    "abs": np.abs,
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
}

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.divide,
    ast.Mod: np.mod,
    ast.Pow: np.power,
}

_CMPOPS = {
    ast.Lt: np.less,
    ast.LtE: np.less_equal,
    ast.Gt: np.greater,
    ast.GtE: np.greater_equal,
    ast.Eq: np.equal,
    ast.NotEq: np.not_equal,
}


class Expression:
    """A compiled formula. ``variables`` lists the names it needs."""

    def __init__(self, source: str):
        self.source = source
        tree = ast.parse(source, mode="eval")
        self._validate(tree.body)
        self._tree = tree.body
        self.variables = sorted(
            {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)} - set(_FUNCS)
        )

    def _validate(self, node: ast.AST) -> None:
        if isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ValueError(f"non-numeric literal {node.value!r}")
        elif isinstance(node, ast.Name):
            pass
        elif isinstance(node, ast.BinOp):
            if type(node.op) not in _BINOPS:
                raise ValueError(f"operator {type(node.op).__name__} not allowed")
            self._validate(node.left)
            self._validate(node.right)
        elif isinstance(node, ast.UnaryOp):
            if not isinstance(node.op, (ast.USub, ast.UAdd)):
                raise ValueError("only unary +/- allowed")
            self._validate(node.operand)
        elif isinstance(node, ast.Compare):
            if len(node.ops) != 1 or type(node.ops[0]) not in _CMPOPS:
                raise ValueError("unsupported comparison")
            self._validate(node.left)
            self._validate(node.comparators[0])
        elif isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
                raise ValueError(f"function not allowed: {ast.dump(node.func)}")
            if node.keywords:
                raise ValueError("keyword args not allowed")
            for a in node.args:
                self._validate(a)
        else:
            raise ValueError(f"syntax not allowed: {type(node).__name__}")

    def evaluate(self, bindings: dict[str, np.ndarray]) -> np.ndarray:
        missing = [v for v in self.variables if v not in bindings]
        if missing:
            raise KeyError(f"unbound variables: {missing}")

        def ev(node):
            if isinstance(node, ast.Constant):
                return np.float64(node.value)
            if isinstance(node, ast.Name):
                return np.asarray(bindings[node.id], dtype=np.float64)
            if isinstance(node, ast.BinOp):
                return _BINOPS[type(node.op)](ev(node.left), ev(node.right))
            if isinstance(node, ast.UnaryOp):
                v = ev(node.operand)
                return -v if isinstance(node.op, ast.USub) else v
            if isinstance(node, ast.Compare):
                return _CMPOPS[type(node.ops[0])](
                    ev(node.left), ev(node.comparators[0])
                ).astype(np.float64)
            if isinstance(node, ast.Call):
                return _FUNCS[node.func.id](*[ev(a) for a in node.args])
            raise AssertionError(node)

        return np.asarray(ev(self._tree), dtype=np.float64)


def compile_expression(source: str) -> Expression:
    return Expression(source)
