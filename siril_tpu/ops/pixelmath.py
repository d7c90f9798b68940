"""Pixel math — equivalent of ``src/pixelMath/pixel_math_runner.c`` (the
``pm "expression"`` command, tinyexpr-based).

Expressions are parsed with Python's ast module into a safe evaluator
over jnp arrays, so the whole expression compiles to one fused XLA
program.  Supported (matching the reference's tinyexpr surface):
variables (loaded image names / $T), literals, + - * / ^ %, comparison
via iif(cond,a,b), functions: abs acos asin atan atan2 ceil cos cosh exp
fac floor ln log log10 log2 max min mtf pow sin sinh sqrt tan tanh
truncate, constants e pi.
"""

from __future__ import annotations

import ast
import math
import operator
from typing import Dict, Optional

import numpy as np

from siril_tpu.core.image import SirilImage


class PixelMathError(ValueError):
    pass


def _fns(jnp):
    def mtf_fn(m, x):
        num = (m - 1.0) * x
        den = (2.0 * m - 1.0) * x - m
        return num / jnp.where(den == 0, 1e-30, den)

    return {
        "abs": jnp.abs, "acos": jnp.arccos, "asin": jnp.arcsin,
        "atan": jnp.arctan, "atan2": jnp.arctan2, "ceil": jnp.ceil,
        "cos": jnp.cos, "cosh": jnp.cosh, "exp": jnp.exp,
        "floor": jnp.floor, "ln": jnp.log, "log": jnp.log10,
        "log10": jnp.log10, "log2": jnp.log2,
        "max": jnp.maximum, "min": jnp.minimum,
        "pow": jnp.power, "sin": jnp.sin, "sinh": jnp.sinh,
        "sqrt": jnp.sqrt, "tan": jnp.tan, "tanh": jnp.tanh,
        "truncate": jnp.trunc, "trunc": jnp.trunc,
        "iif": lambda c, a, b: jnp.where(c != 0, a, b),
        "mtf": mtf_fn,
        "asinh": jnp.arcsinh,
        "mean": lambda *a: sum(a) / len(a),
        # statistical reductions over an image argument
        # (pixel_math_runner.c stat functions)
        "median": lambda x: jnp.median(x),
        "mad": lambda x: jnp.median(jnp.abs(x - jnp.median(x))),
        "mdev": lambda x: jnp.median(jnp.abs(x - jnp.median(x))),
        "adev": lambda x: jnp.mean(jnp.abs(x - jnp.mean(x))),
        "sdev": lambda x: jnp.std(x),
        "avg": lambda x: jnp.mean(x),
        "noise": lambda x: 1.4826 * jnp.median(jnp.abs(x - jnp.median(x))),
    }


_BINOPS = {ast.Add: operator.add, ast.Sub: operator.sub,
           ast.Mult: operator.mul, ast.Div: operator.truediv,
           ast.Pow: operator.pow, ast.Mod: operator.mod}
_CMPOPS = {ast.Gt: operator.gt, ast.Lt: operator.lt, ast.GtE: operator.ge,
           ast.LtE: operator.le, ast.Eq: operator.eq, ast.NotEq: operator.ne}


def evaluate(expr: str, variables: Dict[str, object]):
    """Evaluate a pixel-math expression with image variables (jnp arrays)."""
    import jax.numpy as jnp

    expr = expr.strip().replace("^", "**")
    fns = _fns(jnp)
    consts = {"pi": math.pi, "e": math.e}

    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as e:
        raise PixelMathError(f"syntax error in expression: {e}") from None

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant):
            if isinstance(node.value, (int, float)):
                return float(node.value)
            raise PixelMathError(f"bad literal {node.value!r}")
        if isinstance(node, ast.Name):
            if node.id in variables:
                return variables[node.id]
            if node.id in consts:
                return consts[node.id]
            raise PixelMathError(f"unknown variable '{node.id}'")
        if isinstance(node, ast.BinOp):
            op = _BINOPS.get(type(node.op))
            if op is None:
                raise PixelMathError("unsupported operator")
            return op(ev(node.left), ev(node.right))
        if isinstance(node, ast.UnaryOp):
            v = ev(node.operand)
            if isinstance(node.op, ast.USub):
                return -v
            if isinstance(node.op, ast.UAdd):
                return v
            raise PixelMathError("unsupported unary operator")
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1:
                raise PixelMathError("chained comparisons unsupported")
            op = _CMPOPS.get(type(node.ops[0]))
            if op is None:
                raise PixelMathError("unsupported comparison")
            return op(ev(node.left), ev(node.comparators[0]))
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name):
                raise PixelMathError("bad function call")
            fn = fns.get(node.func.id)
            if fn is None:
                raise PixelMathError(f"unknown function '{node.func.id}'")
            return fn(*[ev(a) for a in node.args])
        raise PixelMathError(f"unsupported syntax: {type(node).__name__}")

    return ev(tree)


def pixel_math(expr: str, images: Dict[str, SirilImage],
               rescale: bool = False,
               rescale_range: Optional[tuple] = None) -> SirilImage:
    """`pm` command: evaluate expression over loaded images."""
    import jax.numpy as jnp

    if not images:
        raise PixelMathError("pixel math needs at least one image")
    first = next(iter(images.values()))
    variables = {name: im.device() for name, im in images.items()}
    shapes = {v.shape for v in variables.values()}
    if len(shapes) > 1:
        raise PixelMathError(f"image dimensions differ: {shapes}")
    out = evaluate(expr, variables)
    out = jnp.broadcast_to(out, first.shape).astype(jnp.float32)
    if rescale:
        lo, hi = rescale_range or (0.0, 1.0)
        mn = out.min()
        mx = out.max()
        out = jnp.where(mx > mn, (out - mn) / (mx - mn) * (hi - lo) + lo, out)
    out = jnp.clip(out, 0.0, 1.0)
    res = first.copy(data=np.asarray(out, np.float32))
    res.log_history(f"Pixel math: {expr}")
    return res
