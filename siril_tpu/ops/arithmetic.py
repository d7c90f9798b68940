"""Image arithmetic — equivalent of ``src/core/arithm.c`` (imoper/soper/
siril_fdiv/addmax, 940 LoC).

Float-first semantics (the framework computes in float32 [0,1]):
- ``imoper`` float path: ADD/SUB unclamped; MUL plain; DIV with b==0 → 0
  (arithm.c:355-367), optional factor.
- ``clip16=True`` emulates the reference's DATA_USHORT path: result is
  quantized with roundf-to-u16 and truncated to [0, 65535] (i.e. [0,1]
  in float scale) — used when the pipeline is in 16-bit mode.
"""

from __future__ import annotations

import numpy as np

OPER_ADD = 0
OPER_SUB = 1
OPER_MUL = 2
OPER_DIV = 3

_U16 = np.float32(65535.0)


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def _q16(xp, v):
    """roundf-to-WORD semantics in [0,1] float scale."""
    return xp.clip(xp.round(v * _U16), 0.0, 65535.0) / _U16


def imoper(a, b, oper: int, factor: float = 1.0, clip16: bool = False):
    """a OP b elementwise; returns new array (does not mutate)."""
    xp = _xp(a)
    a = xp.asarray(a, dtype=xp.float32)
    b = xp.asarray(b, dtype=xp.float32)
    if oper == OPER_ADD:
        r = a + b
    elif oper == OPER_SUB:
        r = a - b
    elif oper == OPER_MUL:
        r = a * b
    elif oper == OPER_DIV:
        r = xp.where(b == 0.0, 0.0, a / xp.where(b == 0.0, 1.0, b))
    else:
        raise ValueError(f"bad operator {oper}")
    if factor != 1.0:
        r = r * np.float32(factor)
    if clip16:
        r = _q16(xp, r)
    return r


def soper(a, scalar: float, oper: int, clip16: bool = False):
    """a OP scalar (soper, arithm.c:184); DIV by zero rejected."""
    xp = _xp(a)
    a = xp.asarray(a, dtype=xp.float32)
    s = np.float32(scalar)
    if oper == OPER_ADD:
        r = a + s
    elif oper == OPER_SUB:
        r = a - s
    elif oper == OPER_MUL:
        r = a * s
    elif oper == OPER_DIV:
        if scalar == 0.0:
            raise ZeroDivisionError("cannot divide by zero")
        r = a / s
    else:
        raise ValueError(f"bad operator {oper}")
    if clip16:
        r = _q16(xp, r)
    return r


def fdiv(a, b, coef: float, clip16: bool = False):
    """a = coef * a / b (siril_fdiv, arithm.c:540) — flat-field division."""
    return imoper(a, b, OPER_DIV, factor=coef, clip16=clip16)


def addmax(a, b):
    """a = max(a, b) (arithm.c:545)."""
    xp = _xp(a)
    return xp.maximum(xp.asarray(a, xp.float32), xp.asarray(b, xp.float32))
