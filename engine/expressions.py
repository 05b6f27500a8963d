"""Compiled sort/rescore expressions — the ``lucene/expressions``
module (upstream ``JavascriptCompiler.compile("...")`` →
``DoubleValuesSource`` bound to ``_score`` and per-doc fields,
used as a SortField or FunctionScoreQuery source [U]).

Re-expressed vectorized: ``compile_expr(src)`` parses the JS-like
arithmetic grammar (the upstream compiler's working set: ``+ - * /
%``, unary ``-``, parentheses, numeric literals, variables, and the
built-in function table) into a closure ``f(bindings) -> np.ndarray``
where ``bindings`` maps variable name → float64 numpy array (or
scalar). All arithmetic is IEEE float64 end-to-end — exactly
upstream's ``double``-typed expression VM — so a DuckDB oracle
computing the same formula reproduces values bit-for-bit.

Parsing uses Python's ``ast`` module in expression mode with a strict
node whitelist (no attributes, subscripts, comprehensions, lambdas or
calls outside ``_FUNCS``) — the expression source is untrusted user
input and is never ``eval``-ed.
"""

from __future__ import annotations

import ast

import numpy as np

_FUNCS = {
    "abs": np.abs, "ceil": np.ceil, "exp": np.exp, "floor": np.floor,
    "ln": np.log, "log10": np.log10, "log2": np.log2,
    "max": np.maximum, "min": np.minimum, "pow": np.power,
    "sqrt": np.sqrt,
}

_BINOPS = {
    ast.Add: np.add, ast.Sub: np.subtract, ast.Mult: np.multiply,
    # fmod, not np.mod: Java's % (upstream JavascriptCompiler) and
    # SQL % are C-style remainders with the dividend's sign —
    # floored modulo diverges for negative operands (-5 % 3: -2 vs 1)
    ast.Div: np.divide, ast.Mod: np.fmod,
}


class ExpressionError(ValueError):
    pass


def compile_expr(src: str):
    """Compile an arithmetic expression into ``f(bindings)``.

    >>> f = compile_expr("_score + sqrt(popularity) / 20")
    >>> f({"_score": np.array([1.0]), "popularity": np.array([400.0])})
    array([2.])
    """
    try:
        tree = ast.parse(src, mode="eval")
    except SyntaxError as e:
        raise ExpressionError(f"bad expression {src!r}: {e}") from e
    names = sorted({n.id for n in ast.walk(tree)
                    if isinstance(n, ast.Name) and n.id not in _FUNCS})
    root = _build(tree.body)

    def fn(bindings: dict) -> np.ndarray:
        missing = [n for n in names if n not in bindings]
        if missing:
            raise ExpressionError(f"unbound variables {missing}")
        env = {k: np.asarray(v, dtype=np.float64)
               for k, v in bindings.items()}
        return np.asarray(root(env), dtype=np.float64)

    fn.variables = names
    return fn


def _build(node):
    if isinstance(node, ast.Constant):
        if not isinstance(node.value, (int, float)):
            raise ExpressionError(f"bad literal {node.value!r}")
        v = float(node.value)
        return lambda env: v
    if isinstance(node, ast.Name):
        name = node.id
        return lambda env: env[name]
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        sub = _build(node.operand)
        return lambda env: np.negative(sub(env))
    if isinstance(node, ast.BinOp):
        op = _BINOPS.get(type(node.op))
        if op is None:
            raise ExpressionError(
                f"operator {type(node.op).__name__} not supported")
        lhs, rhs = _build(node.left), _build(node.right)
        return lambda env: op(lhs(env), rhs(env))
    if isinstance(node, ast.Call):
        if (not isinstance(node.func, ast.Name)
                or node.func.id not in _FUNCS or node.keywords):
            raise ExpressionError("only built-in functions allowed")
        f = _FUNCS[node.func.id]
        args = [_build(a) for a in node.args]
        want = 2 if f in (np.maximum, np.minimum, np.power) else 1
        if len(args) != want:
            raise ExpressionError(
                f"{node.func.id} takes {want} argument(s)")
        return lambda env: f(*(a(env) for a in args))
    raise ExpressionError(
        f"expression node {type(node).__name__} not allowed")
