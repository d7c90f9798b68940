"""Calibration (preprocessing) — equivalent of ``src/core/preprocess.c``.

Pipeline per light frame (preprocess():124):
    fit = (raw − bias − k·dark) / (flat / μ_flat)
with
- synthetic bias level: ``=expr`` strings with $OFFSET substitution
  (evaluateoffsetlevel:600)
- dark optimization: k found by golden-section search minimizing the
  noise (Σ_chan sigma) of raw − k·dark (goldenSectionSearch:88, tol 1e-3,
  bracket [0,2]), or k = exposure ratio with -exp
- flat normalization μ_flat = mean of the flat (per-sequence constant)
- cosmetic correction from the master dark's deviant map (ops/cosmetic)
- optional debayer after calibration (M3)

TPU-native: the whole per-frame chain is ONE fused jit
(calibrate_frame_jit) — bias/dark/flat/cosmetic fuse into a single
elementwise pass over the frame, so each light costs one HBM read+write.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.utils.log import log_error, log_message, log_warning


@dataclass
class CalibArgs:
    bias: Optional[SirilImage] = None
    bias_level: Optional[float] = None       # synthetic bias (float [0,1])
    dark: Optional[SirilImage] = None
    flat: Optional[SirilImage] = None
    use_dark_optim: bool = False
    use_exposure: bool = False               # k = exp ratio instead of search
    use_cosmetic: bool = True                # CC from dark hot/cold map
    sig_cold: float = -1.0                   # <0 disables (reference default)
    sig_hot: float = 3.0
    is_cfa: bool = False
    equalize_cfa: bool = True               # grey_flat: equalize flat CFA
    debayer: bool = False
    flat_norm: Optional[float] = None        # computed if None
    prefix: str = "pp_"


def evaluate_offset_level(expr: str, img: SirilImage) -> float:
    """Synthetic bias expression (evaluateoffsetlevel, preprocess.c:600):
    e.g. "500" (ADU) or "=2048" or "=64*$OFFSET".  Returns float [0,1]."""
    e = expr.strip().lstrip("=").replace(" ", "")
    offset_kw = float(img.keywords.offset or 0)
    e = e.replace("$OFFSET", str(offset_kw)).replace("$offset", str(offset_kw))
    if not re.fullmatch(r"[0-9.+\-*/()]+", e):
        raise ValueError(f"invalid offset expression: {expr}")
    val = float(eval(e, {"__builtins__": {}}, {}))  # noqa: S307 — sanitized
    return val / 65535.0


def _noise_of(diff) -> float:
    """Σ_chan sigma of calibrated image (evaluateNoiseOfCalibratedImage)."""
    import jax.numpy as jnp

    # sigma per channel over all pixels (sample std)
    flat = diff.reshape(diff.shape[0], -1)
    n = flat.shape[1]
    mean = flat.mean(axis=1, keepdims=True)
    var = ((flat - mean) ** 2).sum(axis=1) / (n - 1)
    return float(jnp.sqrt(var).sum())


def dark_optimization_k(raw, dark, use_exposure: bool,
                        raw_exp: float = 0.0, dark_exp: float = 0.0) -> float:
    """Find dark scaling k (darkOptimization, preprocess.c:161)."""
    if use_exposure:
        if dark_exp <= 0 or raw_exp <= 0:
            raise ValueError("exposure-based dark scaling needs EXPTIME")
        k0 = raw_exp / dark_exp
        if k0 > 1.0:
            log_warning("master dark is shorter than lights")
        return k0
    import jax.numpy as jnp

    gr = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = 0.0, 2.0
    raw_d = jnp.asarray(raw)
    dark_d = jnp.asarray(dark)

    def f(k):
        return _noise_of(raw_d - np.float32(k) * dark_d)

    c = b - gr * (b - a)
    d = a + gr * (b - a)
    fc, fd = f(c), f(d)
    if fc == fd:
        return 1.0
    while abs(c - d) > 1e-3:
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = f(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = f(d)
    return (b + a) * 0.5


import functools


@functools.lru_cache(maxsize=32)
def make_calibrate_kernel(has_bias: bool, has_dark: bool, has_flat: bool,
                          has_cc: bool, is_cfa: bool):
    """Fused (raw − bias − k·dark)/(flat/μ) + cosmetic, one jit."""
    import jax
    import jax.numpy as jnp

    from siril_tpu.ops.cosmetic import _neighbor_stack, _offsets

    offs5 = _offsets(2, is_cfa)
    offs3 = _offsets(1, is_cfa)

    @jax.jit
    def kernel(raw, bias, dark, k, flat, inv_flat_mu, cold, hot):
        x = raw
        if has_bias:
            x = x - bias
        if has_dark:
            x = x - k * dark
        if has_flat:
            fnorm = flat * inv_flat_mu
            x = jnp.where(fnorm == 0.0, 0.0,
                          x / jnp.where(fnorm == 0.0, 1.0, fnorm))
        if has_cc:
            out_c = []
            for c in range(x.shape[0]):
                lay = x[c]
                med5 = jnp.median(_neighbor_stack(lay, offs5), axis=0)
                avg3 = jnp.mean(_neighbor_stack(lay, offs3), axis=0)
                lay = jnp.where(cold, med5, lay)
                lay = jnp.where(hot, avg3, lay)
                out_c.append(lay)
            x = jnp.stack(out_c)
        return x

    return kernel


def make_calibrate_batch_kernel(has_bias: bool, has_dark: bool,
                                has_flat: bool, has_cc: bool, is_cfa: bool):
    """Whole-chunk calibrate: ONE program per [chunk, L, H, W] batch with
    an internal ``lax.map`` over frames.  Per-frame ``chunk[j]`` slicing
    through the axon tunnel costs ~0.65 s/slice (each slice is its own
    program execution); the sequential map keeps one frame's cosmetic
    median intermediate live at a time, same pattern as the
    starfinder per-chunk detection program (_stats_cand_fit_fn)."""
    import jax
    from jax import lax

    single = make_calibrate_kernel(has_bias, has_dark, has_flat,
                                   has_cc, is_cfa)

    @jax.jit
    def kernel(raws, bias, dark, k, flat, inv_flat_mu, cold, hot):
        return lax.map(
            lambda f: single(f, bias, dark, k, flat, inv_flat_mu,
                             cold, hot), raws)

    return kernel


def equalize_cfa_flat(flat: np.ndarray) -> np.ndarray:
    """grey_flat: scale the 4 CFA subchannels of a flat to equal means
    (compensate_grey_flat semantics)."""
    out = flat.copy()
    lay = out[0]
    means = np.array([[lay[dy::2, dx::2].mean() for dx in (0, 1)]
                      for dy in (0, 1)])
    target = means.mean()
    for dy in (0, 1):
        for dx in (0, 1):
            m = means[dy, dx]
            if m > 0:
                lay[dy::2, dx::2] *= target / m
    return out


def calibrate_image(raw: SirilImage, args: CalibArgs,
                    _state: Optional[dict] = None) -> SirilImage:
    """calibrate_single_image (preprocess.c:518) — one frame."""
    import jax.numpy as jnp

    st = _state if _state is not None else prepare_calibration(args, raw)
    k = 1.0
    if args.dark is not None and args.use_dark_optim:
        k = dark_optimization_k(
            raw.host(), st["dark"], args.use_exposure,
            raw.keywords.exposure, args.dark.keywords.exposure if args.dark else 0)
    bias_arr = st["bias"] if st["bias"] is not None else jnp.zeros((1, 1, 1))
    dark_arr = st["dark"] if st["dark"] is not None else jnp.zeros((1, 1, 1))
    flat_arr = st["flat"] if st["flat"] is not None else jnp.ones((1, 1, 1))
    out = st["kernel"](raw.device(), bias_arr, dark_arr, np.float32(k),
                       flat_arr, np.float32(st["inv_flat_mu"]),
                       st["cold"], st["hot"])
    res = raw.copy(data=np.asarray(out))
    hist = []
    if args.bias is not None or args.bias_level is not None:
        hist.append("Calibrated with a master bias")
    if args.dark is not None:
        hist.append("Calibrated with a master dark" +
                    (f" (optimized k={k:.3f})" if args.use_dark_optim else ""))
    if args.flat is not None:
        hist.append("Calibrated with a master flat")
    for h in hist:
        res.log_history(h)
    if args.debayer:
        from siril_tpu.ops.demosaic import debayer_image

        res = debayer_image(res)
    return res


def prepare_calibration(args: CalibArgs, sample: SirilImage) -> dict:
    """prepro_prepare_hook (preprocess.c:304): load masters, flat mean,
    deviant map, build the fused kernel."""
    import jax.numpy as jnp

    st: dict = {}
    st["bias"] = None
    if args.bias is not None:
        st["bias"] = jnp.asarray(args.bias.host())
    elif args.bias_level is not None:
        st["bias"] = jnp.full((1, 1, 1), np.float32(args.bias_level))
    st["dark"] = jnp.asarray(args.dark.host()) if args.dark is not None else None
    flat = None
    if args.flat is not None:
        flat_np = args.flat.host()
        if args.is_cfa and args.equalize_cfa:
            flat_np = equalize_cfa_flat(flat_np)
        flat = flat_np
    st["flat"] = jnp.asarray(flat) if flat is not None else None
    if flat is not None:
        mu = args.flat_norm if args.flat_norm else float(flat.mean())
        if mu == 0:
            log_error("flat mean is zero; not normalizing")
            mu = 1.0
        st["inv_flat_mu"] = 1.0 / mu
    else:
        st["inv_flat_mu"] = 1.0
    # cosmetic map from the dark
    H, W = sample.height, sample.width
    cold = np.zeros((H, W), bool)
    hot = np.zeros((H, W), bool)
    has_cc = False
    if args.use_cosmetic and args.dark is not None and \
            (args.sig_cold >= 0 or args.sig_hot >= 0):
        from siril_tpu.ops.cosmetic import detect_deviant_from_dark

        cold, hot = detect_deviant_from_dark(
            args.dark.host()[0], args.sig_cold, args.sig_hot)
        ncold, nhot = int(cold.sum()), int(hot.sum())
        log_message(f"Cosmetic correction: {ncold} cold, {nhot} hot pixels")
        has_cc = ncold + nhot > 0
    st["cold"] = jnp.asarray(cold)
    st["hot"] = jnp.asarray(hot)
    st["has_cc"] = has_cc
    st["is_cfa"] = args.is_cfa
    st["kernel"] = make_calibrate_kernel(
        st["bias"] is not None, st["dark"] is not None,
        st["flat"] is not None, has_cc, args.is_cfa)
    st["batch_kernel"] = make_calibrate_batch_kernel(
        st["bias"] is not None, st["dark"] is not None,
        st["flat"] is not None, has_cc, args.is_cfa)
    return st


def calibrate_sequence(seq: Sequence, args: CalibArgs):
    """`calibrate` command over a sequence → new pp_ sequence."""
    from siril_tpu.core.engine import SeqArgs, run_sequence

    state: dict = {}

    def prepare(ctx):
        sample = seq.read_frame(int(seq.selected_indices()[0]))
        state.update(prepare_calibration(args, sample))

    def image(ctx, idx, img):
        return calibrate_image(img, args, _state=state)

    sargs = SeqArgs(seq=seq, description="Calibration", prefix=args.prefix,
                    prepare=prepare, image=image)
    return run_sequence(sargs)
