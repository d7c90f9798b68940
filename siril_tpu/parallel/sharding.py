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


def fused_pipeline_step(mesh: Mesh, rtype: int, mode: int,
                        siglow: float, sighigh: float,
                        n_frames: int, height: int, width: int,
                        interp_method: int = 1, shift_warp: bool = False,
                        rot_warp: bool = False, aff_warp: bool = False,
                        persp_warp: int = 0, lite_norm: bool = True):
    """Multi-chip fused calibrate→warp→stack step (the sharded variant of
    siril_tpu/pipeline.py):

      raw u16 frames [N, H, W]   sharded (frame, ·, ·)   — dp over frames
        → device decode + dark/flat calibration          [frame-parallel]
        → per-frame estimators + coefficients (pre-warp) [frame-local]
        → per-frame homography warp (vmap)               [frame-parallel]
        → reshard [N, H·W] to (·, pix)                   [all_to_all]
        → fused normalize+reject+mean                    [pixel-parallel]

    Masters and homographies are replicated (tiny). All collectives come
    from sharding annotations — XLA emits all_to_all for the reshard and
    psum/all_gather for the estimator reductions over ICI.
    """
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.interp import _warp_body
    from siril_tpu.ops.normalization import (ADDITIVE, ADDITIVE_SCALING,
                                             MULTIPLICATIVE,
                                             MULTIPLICATIVE_SCALING, NO_NORM)
    from siril_tpu.ops.statistics import norm_estimators_hist_jax

    frame_sh = NamedSharding(mesh, P("frame", None, None))
    rep = NamedSharding(mesh, P())
    pix_sh = NamedSharding(mesh, P(None, "pix"))
    out_sh = NamedSharding(mesh, P("pix"))

    MARGIN = 8        # |shift| bound for the separable fast path

    def _shift_one(p, d):
        """Separable bilinear pure-translation warp (the real pipeline's
        fast path, ops/interp._shift_batch_fn): out(x) = in(x − d)."""
        sx, sy = -d[0], -d[1]
        ix = jnp.clip(jnp.floor(sx).astype(jnp.int32), -MARGIN, MARGIN)
        iy = jnp.clip(jnp.floor(sy).astype(jnp.int32), -MARGIN, MARGIN)
        fx = sx - ix
        fy = sy - iy
        pad = MARGIN + 2
        big = jnp.pad(p, ((pad, pad), (pad, pad)))
        base = jax.lax.dynamic_slice(big, (pad + iy, pad + ix),
                                     (height + 1, width + 1))
        gy = (1.0 - fy) * base[:height] + fy * base[1:height + 1]
        return (1.0 - fx) * gy[:, :width] + fx * gy[:, 1:width + 1]

    def step(raw_i16, Hinvs, dark, flat, ref_pos):
        x = (raw_i16.astype(jnp.float32) + 32768.0) * (1.0 / 65535.0)
        x = x - dark[None]
        fl = jnp.where(flat == 0.0, 1.0, flat)[None]
        x = jnp.where(flat[None] == 0.0, 0.0, x / fl)
        # normalization estimators run PRE-warp, on the frame-sharded
        # axis: (a) each frame's reduction is chip-local (no collective
        # before the all_to_all reshard); (b) interpolation smooths
        # background noise on every non-reference frame, which would
        # bias post-warp scale estimates and make additive-scaling
        # amplify non-reference frames (see pipeline.py step 2 note)
        # histogram medians (the real fused pipeline's estimator for u16
        # sources, statistics.py norm_estimators_hist_jax): O(N+bins)
        # instead of sorts — 3.5× faster per frame on the CPU-emulated
        # mesh and the better TPU formulation as well
        est = norm_estimators_hist_jax(x.reshape(n_frames, height * width),
                                       lite=lite_norm)
        # per-frame warp: frame-parallel, no cross-chip traffic
        if shift_warp:
            # Hinvs carries (N, 2) translations on the fast path
            warped = jax.vmap(_shift_one)(x, Hinvs)
        elif rot_warp:
            # Hinvs carries (N, 5) = (p, q, tx, ty, flip) rotation
            # params (rotations_from_Hs): the FFT three-shear warp —
            # the batch axis is the frame-sharded one, so every FFT
            # and phase ramp stays device-local
            from siril_tpu.ops.interp import rot_shear_core

            warped = rot_shear_core(
                x[:, None], Hinvs[:, 0], Hinvs[:, 1], Hinvs[:, 2:4],
                Hinvs[:, 4] > 0.5, clamp=False)[:, 0]
        elif aff_warp:
            # Hinvs carries (N, 11) = (m00, m01, m10, m11, bx, by,
            # flip, sx_hi, sx_lo, sy_hi, sy_lo) affine params
            # (affines_from_Hs + _sig_pair): the two-pass chirp-Z
            # warp — batched 1-D FFTs along H/W, frame-local like the
            # shear path (scale/skew: focal drift, similarity)
            from siril_tpu.ops.interp import affine_czt_core

            warped = affine_czt_core(
                x[:, None], Hinvs[:, :4].reshape(n_frames, 2, 2),
                Hinvs[:, 4:6], Hinvs[:, 6] > 0.5,
                (Hinvs[:, 7], Hinvs[:, 8]), (Hinvs[:, 9], Hinvs[:, 10]),
                clamp=False)[:, 0]
        elif persp_warp:
            # Hinvs carries (N, 20) = (m00, m01, m10, m11, bx, by,
            # K00..K22, flip, sx_hi, sx_lo, sy_hi, sy_lo) perspective
            # params (perspective_split_from_Hs + _sig_pair); the value
            # of ``persp_warp`` is the static residual bound D.  Affine
            # chirp-Z passes + residual shift passes — frame-local like
            # the other FFT families (mosaic tiles, astrometric H)
            from siril_tpu.ops.interp import perspective_czt_core

            warped = perspective_czt_core(
                x[:, None], Hinvs[:, :4].reshape(n_frames, 2, 2),
                Hinvs[:, 4:6], Hinvs[:, 6:15].reshape(n_frames, 3, 3),
                Hinvs[:, 15] > 0.5,
                (Hinvs[:, 16], Hinvs[:, 17]),
                (Hinvs[:, 18], Hinvs[:, 19]),
                D=int(persp_warp), clamp=False)[:, 0]
        else:
            warped = jax.vmap(
                lambda p, hi: _warp_body(p[None], hi, height, width,
                                         interp_method, False)[0]
            )(x, Hinvs)
        flat_px = warped.reshape(n_frames, height * width)
        flat_px = jax.lax.with_sharding_constraint(flat_px, pix_sh)

        loc = est["location"]
        sca = est["scale"]
        loc0 = loc[ref_pos]
        sca0 = sca[ref_pos]
        if mode in (ADDITIVE_SCALING, MULTIPLICATIVE_SCALING):
            scale = jnp.where(sca == 0.0, 1.0,
                              sca0 / jnp.where(sca == 0, 1.0, sca))
        else:
            scale = jnp.ones_like(sca)
        if mode in (ADDITIVE, ADDITIVE_SCALING):
            normed = jnp.where(flat_px != 0.0,
                               flat_px * scale[:, None]
                               - (scale * loc - loc0)[:, None], 0.0)
        elif mode in (MULTIPLICATIVE, MULTIPLICATIVE_SCALING):
            mul = jnp.where(loc == 0.0, 1.0,
                            loc0 / jnp.where(loc == 0, 1.0, loc))
            normed = flat_px * scale[:, None] * mul[:, None]
        else:
            normed = flat_px
        mean, rl, rh = rj.rejection_mean(normed, rtype, siglow, sighigh,
                                         n_full=n_frames)
        return mean, rl.sum(), rh.sum()

    return jax.jit(step,
                   in_shardings=(frame_sh, rep, rep, rep, None),
                   out_shardings=(out_sh, None, None))
