"""Star detection — equivalent of ``src/algos/star_finder.c`` (peaker:173
+ minimize_candidates:569).

Pipeline, TPU-native:
1. per-layer background (median) and noise (bgnoise) set the dynamic
   threshold  thr = bg + sigma·noise  (star_finder_params.sigma,
   settings.h:296-308; default sigma=1.0, radius=10)
2. candidate mask = pixels above thr that are the maximum of their
   (2r+1)² neighborhood (lax.reduce_window max-pool — the reference's
   scalar local-maxima scan)
3. top-K candidates by peak value, padded to a fixed K for one compile
4. (2R+1)² patches gathered with vmapped dynamic_slice and fit by the
   batched LM PSF engine (registration/psf.py) in ONE device call —
   the reference fits candidates one-by-one with GSL
5. quality filters (A bounds, roundness, fwhm sanity, rmse) + minimum
   separation dedup, brightest kept (reference candidate dedup)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional

import numpy as np

from siril_tpu.registration.psf import (
    PROFILE_GAUSSIAN,
    PSFStar,
    fit_psf_batch,
    stars_from_fit,
)


@dataclass
class StarFinderParams:
    """star_finder_params (settings.h:296-308) defaults."""

    radius: int = 10
    sigma: float = 1.0
    roundness: float = 0.5
    convergence: int = 1
    relax_checks: bool = False
    profile: int = PROFILE_GAUSSIAN
    min_beta: float = 1.5
    min_A: float = 0.0
    max_A: float = 0.0           # 0 = no bound
    max_r: float = 1.0
    max_stars: int = 2000


@lru_cache(maxsize=8)
def _candidate_fn(r: int, k: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def candidates(x, thr):
        # max pooling is separable: two 1-D windows are (4r+2) ops/pixel
        # vs (2r+1)² for the 2-D window — ~10× fewer at r=10 (XLA's
        # stride-1 reduce_window lowering measured FASTER than a manual
        # log-doubling shifted-max ladder on TPU, so keep it)
        mp = lax.reduce_window(x, -jnp.inf, lax.max,
                               (2 * r + 1, 1), (1, 1), "SAME")
        mp = lax.reduce_window(mp, -jnp.inf, lax.max,
                               (1, 2 * r + 1), (1, 1), "SAME")
        mask = (x >= mp) & (x > thr)
        yy = lax.broadcasted_iota(jnp.int32, x.shape, 0)
        xx = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        inb = (yy >= r) & (yy < x.shape[0] - r) & \
            (xx >= r) & (xx < x.shape[1] - r)
        resp = jnp.where(mask & inb, x, -jnp.inf)
        flat = resp.ravel()
        # cell-argmax compaction before top-k: two DISTINCT-valued local
        # maxima of a (2r+1)² window are > r apart (each would sit in
        # the other's window), so any (r+1)×(r+1) cell holds at most one
        # non-tied candidate and per-cell argmax is LOSSLESS (tied twins
        # within one cell collapse, exactly as the min-separation dedup
        # would collapse them anyway).  This shrinks the top-k input
        # ~(r+1)² fold: a full-image top_k cost ~1 ms/Mpix on TPU and
        # dominated the candidate stage.
        Himg, Wimg = x.shape
        c = r + 1
        ncy, ncx = -(-Himg // c), -(-Wimg // c)
        if Himg * Wimg >= 1 << 22 and ncy * ncx >= k:
            hp, wp = ncy * c, ncx * c
            padded = jnp.pad(resp, ((0, hp - Himg), (0, wp - Wimg)),
                             constant_values=-jnp.inf)
            cells = padded.reshape(ncy, c, ncx, c).transpose(
                0, 2, 1, 3).reshape(ncy * ncx, c * c)
            sub_i = jnp.argmax(cells, axis=-1)             # [ncells]
            sub_v = jnp.take_along_axis(cells, sub_i[:, None],
                                        axis=-1)[:, 0]
            ci = jnp.arange(ncy * ncx, dtype=jnp.int32)
            by = (ci // ncx) * c + (sub_i // c).astype(jnp.int32)
            bx = (ci % ncx) * c + (sub_i % c).astype(jnp.int32)
            v, j = lax.top_k(sub_v, k)                     # k of ~H·W/c²
            cand_i = (by * Wimg + bx).astype(jnp.int32)
            return v, jnp.clip(cand_i[j], 0, Himg * Wimg - 1)
        return lax.top_k(flat, k)

    return candidates


@lru_cache(maxsize=8)
def _gather_fn(b: int):
    import jax
    from jax import lax

    @jax.jit
    def gather(x, ys, xs):
        def one(y0, x0):
            return lax.dynamic_slice(x, (y0, x0), (b, b))
        return jax.vmap(one)(ys, xs)

    return gather


def detect_stars(layer: np.ndarray, params: Optional[StarFinderParams] = None,
                 max_stars: Optional[int] = None,
                 bg: Optional[float] = None,
                 noise: Optional[float] = None) -> List[PSFStar]:
    """peaker() equivalent on one (H, W) layer.  Returns stars sorted by
    amplitude (brightest first)."""
    import jax.numpy as jnp

    p = params or StarFinderParams()
    K = int(max_stars or p.max_stars)
    H, W = layer.shape
    R = detection_radius(H, W, p)
    box = 2 * R + 1

    if bg is None or noise is None:
        from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_np

        st = compute_stats_np(layer, STATS_BASIC)
        bg = st.median if bg is None else bg
        noise = st.bgnoise if noise is None else noise
    thr = bg + p.sigma * max(noise, 1e-7)

    x = jnp.asarray(layer, jnp.float32)
    vals, idx = _candidate_fn(R, K)(x, jnp.float32(thr))
    vals = np.asarray(vals)
    idx = np.asarray(idx)
    n_cand = int((vals > -np.inf).sum())
    if n_cand == 0:
        return []
    cy = (idx // W)[:n_cand]
    cx = (idx % W)[:n_cand]

    y0s = np.clip(cy - R, 0, H - box).astype(np.int32)
    x0s = np.clip(cx - R, 0, W - box).astype(np.int32)
    patches = _gather_fn(box)(x, jnp.asarray(y0s), jnp.asarray(x0s))

    fit = fit_psf_batch(patches, profile=p.profile)
    stars = stars_from_fit(fit, x0s, y0s, box, p.profile)

    # second chance for blended fits: neighbors inside the box elongate
    # the profile (roundness collapse).  Refit those on a smaller crop
    # centered on the candidate peak (the reference optimizes its box
    # size per star, PSF.h:25 'R').
    if box >= 13:
        retry = [i for i, s in enumerate(stars)
                 if np.isfinite(s.fwhmx) and
                 (s.roundness < p.roundness or s.fwhmx > box / 2)]
        if retry:
            half = box // 2
            small = (half // 2) * 2 + 1          # odd, ≈ half the box
            off = (box - small) // 2
            sub = patches[np.asarray(retry)][:, off:off + small,
                           off:off + small]
            fit2 = fit_psf_batch(sub, profile=p.profile)
            stars2 = stars_from_fit(fit2, x0s[retry] + off, y0s[retry] + off,
                                    small, p.profile)
            for k, i in enumerate(retry):
                s2 = stars2[k]
                if s2.roundness > stars[i].roundness and \
                        0.5 < s2.fwhmx <= small:
                    stars[i] = s2

    return _filter_and_dedup(stars, x0s, y0s, R, box, p, noise,
                             float(np.max(layer)))


def _filter_and_dedup(stars, x0s, y0s, R, box, p, noise, sat):
    """Quality filters + min-separation dedup (minimize_candidates
    checks, star_finder.c:569).  Filters run as ONE vectorized mask over
    attribute arrays — the per-star Python loop (an np.isfinite array
    per candidate) cost ~3 s per 100-frame batch on a 1-core host."""
    if not stars:
        return []
    cols = np.array([(s.A, s.B, s.x0, s.y0, s.fwhmx, s.fwhmy,
                      s.roundness, s.rmse) for s in stars], np.float64)
    A, B, sx, sy, fx, fy, rnd, rmse = cols.T
    with np.errstate(invalid="ignore"):
        ok = np.isfinite(cols).all(axis=1)
        ok &= (A >= 1e-5) & (A >= 5.0 * noise)
        if p.min_A:
            ok &= A >= p.min_A
        if p.max_A:
            ok &= A <= p.max_A
        ok &= (fx > 0.5) & (fy > 0.5) & (fx <= box)
        if not p.relax_checks:
            ok &= rnd >= p.roundness
            ok &= rmse <= 0.1 * (A + 1e-9) + 0.05
        cx = np.asarray(x0s, np.float64) + R
        cy = np.asarray(y0s, np.float64) + R
        ok &= (np.abs(sx - cx) <= R) & (np.abs(sy - cy) <= R)
    idx = np.nonzero(ok)[0]
    if idx.size == 0:
        return []
    for i in idx:
        stars[i].has_saturated = A[i] + B[i] >= 0.98 * sat

    # dedup: min separation R/2, keep brightest — greedy over the
    # brightness ordering with a vectorized distance check per candidate
    order = idx[np.argsort(-A[idx], kind="stable")]
    min_d2 = (R * 0.5) ** 2
    out: List[PSFStar] = []
    ax = np.empty(order.size)
    ay = np.empty(order.size)
    nacc = 0
    for i in order:
        if nacc == 0 or (((sx[i] - ax[:nacc]) ** 2
                          + (sy[i] - ay[:nacc]) ** 2) >= min_d2).all():
            ax[nacc] = sx[i]
            ay[nacc] = sy[i]
            nacc += 1
            out.append(stars[i])
    return out


@lru_cache(maxsize=8)
def _batch_candidate_fn(r: int, k: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    single = _candidate_fn(r, k)

    @jax.jit
    def run(frames, thrs):
        # lax.map, not vmap: vmap materializes N full-frame intermediates
        # (maxpool, mask, padded tiles ≈ 4×N×H×W bytes — OOM at 40×16 Mpix
        # on top of the resident stack); the sequential map keeps one
        # frame's worth live and a 16 Mpix frame already fills the chip
        return lax.map(lambda a: single(a[0], a[1]), (frames, thrs))

    return run


@lru_cache(maxsize=8)
def _batch_stats_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(frames):
        from siril_tpu.ops.statistics import hist_median_jax

        # batched bisection medians (statistics.py hist_median_jax):
        # exact on the u16 grid, nothing but fused compare+reduce passes
        # — a full-sort median is ~seconds/frame at 16 Mpix on TPU, and a
        # per-frame lax.map pays ~10 ms dispatch per bisect step
        n = frames.shape[0]
        flat = frames.reshape(n, -1)
        valid = jnp.isfinite(flat)
        med = hist_median_jax(flat, valid)
        mad = hist_median_jax(jnp.abs(flat - med[:, None]), valid)
        mx = flat.max(axis=1)
        return jnp.stack([med, 1.4826 * mad, mx])

    return run


@lru_cache(maxsize=8)
def _batch_gather_fn(b: int):
    import jax
    from jax import lax

    @jax.jit
    def run(frames, fi, ys, xs):
        # slice the 3D array directly: indexing frames[i] under vmap
        # would materialize a [n_cand, H, W] gather (100 GB at 4 Mpix)
        def one(i, y0, x0):
            return lax.dynamic_slice(frames, (i, y0, x0), (1, b, b))[0]
        return jax.vmap(one)(fi, ys, xs)

    return run


def detection_radius(H: int, W: int,
                     params: Optional[StarFinderParams] = None) -> int:
    """The candidate-search radius used for an (H, W) layer."""
    p = params or StarFinderParams()
    R = int(p.radius)
    box = 2 * R + 1
    if H < 4 * box or W < 4 * box:
        R = max(min(H, W) // 8, 3)
    return R


@lru_cache(maxsize=8)
def _stats_cand_fit_fn(r: int, k: int, sigma: float, profile: int):
    """One fused device program per frame-chunk: detection stats +
    threshold + candidate top-k + patch gather + batched LM PSF fit —
    the ENTIRE per-frame detection compute, dispatched while the next
    chunk is still DMA-ing in.  The fused pipeline fetches one packed
    array at the end instead of syncing per stage (each fetch through
    the axon tunnel costs 1–2 s of latency, and the PSF fit used to be
    a post-upload synchronous stage on the critical path)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from siril_tpu.registration.psf import (
        PROFILE_MOFFAT,
        PROFILE_MOFFAT_FIXED,
        _get_fitter,
    )

    cand = _candidate_fn(r, k)
    box = 2 * r + 1
    moffat = profile in (PROFILE_MOFFAT, PROFILE_MOFFAT_FIXED)
    free_beta = profile == PROFILE_MOFFAT
    beta_fixed = None if free_beta else (2.0 if moffat else None)
    fitter = _get_fitter(box, moffat, free_beta, beta_fixed, 2.0, 40)

    @jax.jit
    def run(frames):
        from siril_tpu.ops.statistics import hist_median_jax

        n = frames.shape[0]
        H, W = int(frames.shape[1]), int(frames.shape[2])
        flat = frames.reshape(n, -1)
        valid = jnp.isfinite(flat)
        med = hist_median_jax(flat, valid)
        mad = hist_median_jax(jnp.abs(flat - med[:, None]), valid)
        mx = flat.max(axis=1)
        stats = jnp.stack([med, 1.4826 * mad, mx])
        thrs = med + np.float32(sigma) * jnp.maximum(1.4826 * mad, 1e-7)

        def per_frame(a):
            x, thr = a
            v, i = cand(x, thr)
            # the SAME patch-origin rule as the host decode path in
            # detect_stars_batch — divergence would shift patch coords
            cy = i // W
            cx = i % W
            y0 = jnp.clip(cy - r, 0, H - box).astype(jnp.int32)
            x0 = jnp.clip(cx - r, 0, W - box).astype(jnp.int32)

            def one(yy, xx):
                return lax.dynamic_slice(x, (yy, xx), (box, box))

            patches = jax.vmap(one)(y0, x0)
            return v, i, fitter(patches)          # fit: [k, npar+1]

        vals, idx, fits = lax.map(per_frame,
                                  (frames, thrs.astype(jnp.float32)))
        return stats, vals, idx, fits

    return run


def detect_stars_batch(frames, params: Optional[StarFinderParams] = None,
                       max_stars: int = 500,
                       precomputed=None) -> List[List[PSFStar]]:
    """Batched peaker over N frames in a handful of device calls — used
    by the fused pipeline where per-frame round-trips through the axon
    tunnel (~30 ms latency each) dominate per-frame detection.

    ``frames``: (N, H, W) array (device-resident or host), or a LIST of
    (n_i, H, W) chunk arrays (requires ``precomputed``; the fused
    pipeline keeps its stack chunked to stay at 1× HBM).  Detection
    noise uses the device MAD estimate (≈ bgnoise on sky-dominated
    frames) instead of the host k-sigma estimator of the single-frame
    path.  Returns one star list per frame.
    """
    import jax.numpy as jnp

    p = params or StarFinderParams()
    if isinstance(frames, (list, tuple)):
        if precomputed is None:
            raise ValueError("chunked frames require precomputed "
                             "stats/candidates/fits (_stats_cand_fit_fn)")
        chunks = list(frames)
        frames = None
        N = sum(int(c.shape[0]) for c in chunks)
        H, W = (int(d) for d in chunks[0].shape[-2:])
    else:
        chunks = None
        frames = jnp.asarray(frames, jnp.float32)
        N, H, W = frames.shape
    # the SAME radius rule as _stats_cand_fit_fn — precomputed candidate
    # indices are decoded with it, a divergent copy would shift patches
    R = detection_radius(H, W, p)
    box = 2 * R + 1
    K = int(max_stars)

    from siril_tpu.utils.trace import stage

    fits_h = None
    if precomputed is not None:
        with stage("sf.fetch_pre"):
            stats, vals, idx, fits_h = precomputed
            fits_h = np.asarray(fits_h)
            stats = np.asarray(stats)
            vals = np.asarray(vals)
            idx = np.asarray(idx)
        bgs, noises, sats = stats[0], np.maximum(stats[1], 1e-7), stats[2]
    else:
        with stage("sf.stats"):
            stats = np.asarray(_batch_stats_fn()(frames))  # [3, N] one fetch
        bgs, noises, sats = stats[0], np.maximum(stats[1], 1e-7), stats[2]
        thrs = (bgs + p.sigma * noises).astype(np.float32)

        with stage("sf.candidates"):
            vals, idx = _batch_candidate_fn(R, K)(frames, jnp.asarray(thrs))
            vals = np.asarray(vals)                     # [N, K] one fetch
            idx = np.asarray(idx)

    # flatten valid candidates across frames
    fi, ki = np.nonzero(vals > -np.inf)
    if fi.size == 0:
        return [[] for _ in range(N)]
    cy = (idx[fi, ki] // W).astype(np.int32)
    cx = (idx[fi, ki] % W).astype(np.int32)
    y0s = np.clip(cy - R, 0, H - box).astype(np.int32)
    x0s = np.clip(cx - R, 0, W - box).astype(np.int32)
    patches = None
    if fits_h is not None:
        # PSF fits already computed on device inside the per-chunk
        # upload-time program (_stats_cand_fit_fn) — just decode the rows
        with stage("sf.psf_decode"):
            from siril_tpu.registration.psf import fit_dict_from_packed

            fit = fit_dict_from_packed(fits_h[fi, ki], p.profile)
    else:
        with stage("sf.patches"):
            # keep the patch stack on device — fit_psf_batch consumes it
            # there, and the tunnel's device→host path is ~50× slower
            # than upload, so a ~30 MB fetch would dominate detection
            if chunks is not None:
                # fi ascends (np.nonzero row-major), so per-chunk gathers
                # concatenate back in candidate order
                parts, base = [], 0
                for ch in chunks:
                    m = (fi >= base) & (fi < base + ch.shape[0])
                    if m.any():
                        parts.append(_batch_gather_fn(box)(
                            ch,
                            jnp.asarray((fi[m] - base).astype(np.int32)),
                            jnp.asarray(y0s[m]), jnp.asarray(x0s[m])))
                    base += ch.shape[0]
                patches = jnp.concatenate(parts, axis=0)
            else:
                patches = _batch_gather_fn(box)(
                    frames, jnp.asarray(fi.astype(np.int32)),
                    jnp.asarray(y0s), jnp.asarray(x0s))

        with stage("sf.psf_fit"):
            fit = fit_psf_batch(patches, profile=p.profile)  # one call
    with stage("sf.mkstars"):
        stars = stars_from_fit(fit, x0s, y0s, box, p.profile)

    # second-chance refit for blended candidates (same rule as the
    # single-frame path): one extra batched fit on smaller crops
    if box >= 13:
        retry = [i for i, s in enumerate(stars)
                 if np.isfinite(s.fwhmx) and
                 (s.roundness < p.roundness or s.fwhmx > box / 2)]
        if len(retry) > 4096:
            # pathological inputs (e.g. raw CFA mosaics) flag nearly every
            # candidate; refit only the brightest — beyond that the refit
            # outcosts the whole detection pass
            retry = sorted(retry, key=lambda i: -stars[i].A)[:4096]
        if retry:
            with stage("sf.retry"):
                half = box // 2
                small = (half // 2) * 2 + 1
                off = (box - small) // 2
                ridx = np.asarray(retry)
                if patches is not None:
                    sub = patches[ridx][:, off:off + small,
                                   off:off + small]
                else:
                    # fused-fit path kept no patch stack: gather the
                    # retry crops from the resident frames (device)
                    rfi = fi[ridx]
                    ys = (y0s[ridx] + off).astype(np.int32)
                    xs = (x0s[ridx] + off).astype(np.int32)
                    if chunks is not None:
                        parts, base = [], 0
                        for ch in chunks:
                            m = (rfi >= base) & (rfi < base + ch.shape[0])
                            if m.any():
                                parts.append(_batch_gather_fn(small)(
                                    ch, jnp.asarray(
                                        (rfi[m] - base).astype(np.int32)),
                                    jnp.asarray(ys[m]),
                                    jnp.asarray(xs[m])))
                            base += ch.shape[0]
                        sub = jnp.concatenate(parts, axis=0)
                    else:
                        sub = _batch_gather_fn(small)(
                            frames, jnp.asarray(rfi.astype(np.int32)),
                            jnp.asarray(ys), jnp.asarray(xs))
                fit2 = fit_psf_batch(sub, profile=p.profile)
                stars2 = stars_from_fit(fit2, x0s[retry] + off,
                                        y0s[retry] + off, small, p.profile)
                for k, i in enumerate(retry):
                    s2 = stars2[k]
                    if s2.roundness > stars[i].roundness and \
                            0.5 < s2.fwhmx <= small:
                        stars[i] = s2

    with stage("sf.dedup"):
        out: List[List[PSFStar]] = []
        for f in range(N):
            sel = np.nonzero(fi == f)[0]
            out.append(_filter_and_dedup(
                [stars[i] for i in sel], x0s[sel], y0s[sel], R, box, p,
                float(noises[f]), float(sats[f])))
    return out


def save_star_list_csv(stars: List[PSFStar], path: str) -> None:
    """Star list persistence (star_finder.c:933 CSV writer)."""
    import csv

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["x", "y", "FWHMx", "FWHMy", "angle", "A", "B",
                    "roundness", "rmse", "beta"])
        for s in stars:
            w.writerow([f"{s.x0:.3f}", f"{s.y0:.3f}", f"{s.fwhmx:.3f}",
                        f"{s.fwhmy:.3f}", f"{s.angle:.2f}", f"{s.A:.5f}",
                        f"{s.B:.5f}", f"{s.roundness:.3f}",
                        f"{s.rmse:.5f}", f"{s.beta:.2f}"])


def load_star_list_csv(path: str) -> List[PSFStar]:
    import csv

    out = []
    with open(path) as f:
        for row in csv.DictReader(f):
            s = PSFStar(x0=float(row["x"]), y0=float(row["y"]),
                        fwhmx=float(row["FWHMx"]), fwhmy=float(row["FWHMy"]),
                        angle=float(row["angle"]), A=float(row["A"]),
                        B=float(row["B"]), rmse=float(row["rmse"]),
                        beta=float(row["beta"]))
            out.append(s)
    return out
