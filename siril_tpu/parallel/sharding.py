"""Multi-chip sharding for the stacking pipeline.

The reference is single-node shared-memory (SURVEY §2.9); this module is
the from-scratch distributed design: a 2D device mesh over

  - ``frame``: data-parallel axis for per-frame work (normalization
    estimators, calibration, registration hooks) — each chip owns a group
    of frames;
  - ``pix``: the sharded pixel axis for the per-pixel stacking kernel —
    every chip holds ALL N frame values for ITS pixels, so rejection
    sorts/medians never cross chips (mirrors Siril's row-block design,
    ``median_and_mean.c:1384``, where a thread owns a row block).

Between the two stages XLA insert collectives from the sharding
annotations alone: per-frame coefficients are tiny (an all_gather over
``frame``), and the frame-sharded pixel data resharding to pixel-sharded
is an all_to_all — both ride ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_frame_groups: int = 1, n_pix_shards: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_pix_shards is None:
        n_pix_shards = n // n_frame_groups
    dev = np.asarray(devices[: n_frame_groups * n_pix_shards]).reshape(
        n_frame_groups, n_pix_shards)
    return Mesh(dev, ("frame", "pix"))


def full_stack_step(mesh: Mesh, rtype: int, mode: int,
                    siglow: float, sighigh: float, n_frames: int):
    """Build the jitted multi-chip stack step:

      frames (N, P) sharded (frame, pix)
        → per-frame median/MAD estimators    [frame-parallel, pix-reduced]
        → normalization coefficients vs ref  [replicated — all_gather]
        → normalize + reject + mean          [pixel-parallel]

    The estimator reduction over sharded pixels and the resharding of the
    frame data between stages are expressed purely via shardings; XLA
    emits psum/all_gather/all_to_all over the mesh.
    """
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import (ADDITIVE, ADDITIVE_SCALING,
                                             MULTIPLICATIVE,
                                             MULTIPLICATIVE_SCALING, NO_NORM)
    from siril_tpu.ops.statistics import norm_estimators_jax

    in_sharding = NamedSharding(mesh, P("frame", "pix"))
    pix_sharding = NamedSharding(mesh, P(None, "pix"))
    out_sharding = NamedSharding(mesh, P("pix"))

    def step(stack, ref_pos):
        # stage 1: per-frame robust estimators (median + 1.5·MAD lite norm)
        est = norm_estimators_jax(stack, lite=True)
        loc = est["location"]
        sca = est["scale"]
        loc0 = loc[ref_pos]
        sca0 = sca[ref_pos]
        if mode in (ADDITIVE_SCALING, MULTIPLICATIVE_SCALING):
            scale = jnp.where(sca == 0.0, 1.0, sca0 / jnp.where(sca == 0, 1.0, sca))
        else:
            scale = jnp.ones_like(sca)
        if mode in (ADDITIVE, ADDITIVE_SCALING):
            offset = scale * loc - loc0
            mul = jnp.ones_like(loc)
        elif mode in (MULTIPLICATIVE, MULTIPLICATIVE_SCALING):
            offset = jnp.zeros_like(loc)
            mul = jnp.where(loc == 0.0, 1.0, loc0 / jnp.where(loc == 0, 1.0, loc))
        else:
            offset = jnp.zeros_like(loc)
            mul = jnp.ones_like(loc)

        # stage 2: pixel-sharded fused normalize+reject+mean
        stack_p = jax.lax.with_sharding_constraint(stack, pix_sharding)
        if mode in (ADDITIVE, ADDITIVE_SCALING):
            normed = jnp.where(stack_p != 0.0,
                               stack_p * scale[:, None] - offset[:, None], 0.0)
        elif mode in (MULTIPLICATIVE, MULTIPLICATIVE_SCALING):
            normed = stack_p * scale[:, None] * mul[:, None]
        else:
            normed = stack_p
        mean, rl, rh = rj.rejection_mean(normed, rtype, siglow, sighigh,
                                         n_full=n_frames)
        return mean, rl, rh

    return jax.jit(step, in_shardings=(in_sharding, None),
                   out_shardings=(out_sharding, out_sharding, out_sharding))


def sharded_rejection_kernel(mesh: Mesh, rtype: int, siglow: float,
                             sighigh: float, n_frames: int):
    """Pixel-sharded rejection-only kernel (stack already normalized)."""
    from siril_tpu.ops import rejection as rj

    pix = NamedSharding(mesh, P(None, "pix"))
    out = NamedSharding(mesh, P("pix"))

    def step(stack):
        return rj.rejection_mean(stack, rtype, siglow, sighigh,
                                 n_full=n_frames)

    return jax.jit(step, in_shardings=(pix,), out_shardings=(out, out, out))
