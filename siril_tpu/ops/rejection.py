"""Pixel-rejection stacking kernels — the primary hot path.

TPU-native re-design of ``src/stacking/rejection_float.c`` (apply_rejection_float:100)
and ``median_and_mean.c:956`` (mean_and_reject).  The reference iterates
per-pixel scalar loops over an N-frame "stack" vector; here the whole tile
is processed at once: ``stack`` has shape (N, P) — N frames × P pixels —
and every rejection algorithm is expressed as vectorized reductions over
the frame axis with per-pixel state, so the VPU processes all pixels of a
tile in parallel and XLA fuses the iteration bodies.

Key structural insight used throughout: after sorting each pixel's frame
vector ascending (invalid/zero entries pushed to +inf), sigma-style
clipping (reject if median−x > σ·kσlow or x−median > σ·kσhigh) always
rejects a *prefix* and a *suffix* — the kept set stays a contiguous window
[lo, hi).  So SIGMA / MAD / PERCENTILE / WINSORIZED iterate on two int32
indices per pixel with O(N) elementwise work per round and no re-sorting.
LINEARFIT keeps a boolean mask (order is preserved by compaction of a
sorted array), SIGMEDIAN updates values in place, GESDT walks the window
sequentially with prefix sums (Grubbs statistic is O(1) per step on a
sorted window).

Reference quirks replicated for output parity (each cited):
- zero pixels removed before rejection (rejection_float.c:115-136)
- the cumulative no-more-rejections guard ``N - r <= 4``
  (rejection_float.c:188-196; r accumulates across iterations)
- sd with N−1 denominator (statistics.h:82-106)
- LINEARFIT uses m_x, m_dx2 precomputed for the FULL frame count even
  after rejections shrink N (median_and_mean.c:1491-1499)
- GESDT always confirms outliers down to iteration 0 once the scan stops
  (confirm_outliers, median_and_mean.c:685-701), and records the
  *shrunk-array* index for high-end removals (rejection_float.c:332)
- winsorized sigma loop: clamp to med±1.5σ, σ ← 1.134·sd, until
  |σ−σ0| ≤ 0.0005·σ0 (rejection_float.c:222-236)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# rejection types (settings.h:43-52)
NO_REJEC = 0
PERCENTILE = 1
SIGMA = 2
MAD = 3
SIGMEDIAN = 4
WINSORIZED = 5
LINEARFIT = 6
GESDT = 7

REJECTION_NAMES = {
    "n": NO_REJEC, "none": NO_REJEC,
    "p": PERCENTILE, "percentile": PERCENTILE,
    "s": SIGMA, "sigma": SIGMA,
    "m": MAD, "mad": MAD,
    "a": SIGMEDIAN, "sigmedian": SIGMEDIAN,
    "w": WINSORIZED, "winsorized": WINSORIZED,
    "l": LINEARFIT, "linear": LINEARFIT, "linearfit": LINEARFIT,
    "g": GESDT, "gesdt": GESDT, "generalized": GESDT,
}

_INF = jnp.float32(np.inf)


# ---------------------------------------------------------------------------
# masked / windowed reductions over the frame axis (axis 0)
# ---------------------------------------------------------------------------


def _select_at(xs, idx_row):
    """xs[idx_row[p], p] per pixel via mask-reduce (NO gather: dynamic
    per-pixel gathers lower poorly on TPU; an N-length masked sum is pure
    VPU work and fuses with neighbors)."""
    rows = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    return jnp.where(rows == idx_row[None, :], xs, 0.0).sum(axis=0)


def _window_median(xs, lo, hi):
    """Median of sorted xs[lo:hi] per pixel.  xs: (N, P); lo,hi: (P,) int32.

    Exact median (average of the two middle values for even count), matching
    gsl_stats_median_from_sorted_data / quickmedian semantics.
    """
    n = jnp.maximum(hi - lo, 1)
    i0 = lo + (n - 1) // 2
    i1 = lo + n // 2
    rows = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    v0 = jnp.where(rows == i0[None, :], xs, 0.0).sum(axis=0)
    v1 = jnp.where(rows == i1[None, :], xs, 0.0).sum(axis=0)
    return 0.5 * (v0 + v1)


def _window_sums(xs):
    """Kept for API symmetry: window sums are computed directly from
    masked reductions (cheaper than prefix-sum + gather on TPU)."""
    safe = jnp.where(jnp.isfinite(xs), xs, 0.0)
    return safe, safe * safe


def _window_mean_sd(s1, s2, lo, hi):
    """Mean and sample-sd (N−1) of the window [lo,hi) via masked sums.
    s1/s2 are the (xs, xs²) planes from _window_sums."""
    rows = lax.broadcasted_iota(jnp.int32, s1.shape, 0)
    inwin = (rows >= lo[None, :]) & (rows < hi[None, :])
    n = (hi - lo).astype(jnp.float32)
    t1 = jnp.where(inwin, s1, 0.0).sum(axis=0)
    t2 = jnp.where(inwin, s2, 0.0).sum(axis=0)
    nsafe = jnp.maximum(n, 1.0)
    mean = t1 / nsafe
    var = (t2 - t1 * mean) / jnp.maximum(n - 1.0, 1.0)
    sd = jnp.sqrt(jnp.maximum(var, 0.0))
    return mean, jnp.where(n > 1, sd, 0.0)


def _mask_median(x, mask):
    """Median over masked entries (re-sorts); x,(N,P), mask bool."""
    xs = jnp.sort(jnp.where(mask, x, _INF), axis=0)
    n = mask.sum(axis=0)
    lo = jnp.zeros_like(n)
    return _window_median(xs, lo, n)


def _mask_mean_sd(x, mask):
    n = mask.sum(axis=0).astype(jnp.float32)
    nsafe = jnp.maximum(n, 1.0)
    xm = jnp.where(mask, x, 0.0)
    mean = xm.sum(axis=0) / nsafe
    var = (jnp.where(mask, (x - mean) ** 2, 0.0)).sum(axis=0) / jnp.maximum(n - 1.0, 1.0)
    sd = jnp.sqrt(jnp.maximum(var, 0.0))
    return mean, jnp.where(n > 1, sd, 0.0)


# ---------------------------------------------------------------------------
# window-based methods: SIGMA, MAD, PERCENTILE, WINSORIZED
# ---------------------------------------------------------------------------


def _clip_window(xs, lo, hi, r, center, spread, siglow, sighigh, active):
    """One clipping round on the sorted window: reject prefix where
    center−x > spread·siglow and suffix where x−center > spread·sighigh,
    honoring the cumulative N−r≤4 guard (frame order = ascending value
    order, i.e. low-side candidates are 'first').

    When the guard TRUNCATES the high side mid-scan (n_high <
    cand_high), the C scan — ascending — rejects the SMALLEST high
    candidates and keeps the largest ones (rejection_float.c:189-196:
    once ``N − r <= 4`` the remaining frames are kept verbatim).  The
    kept top slice [hi−cand_high+n_high, hi) is returned as a segment
    (seg_lo, seg_hi); the iterating window drops ALL high candidates.
    The budget algebra makes truncation terminal — the next round's
    ``max_acc`` is negative, so no further rejection can occur and the
    segment never needs to participate in later rounds' statistics.

    Returns (new_lo, new_hi, new_r, changed, n_low, n_high,
    seg_lo, seg_hi); the segment is empty (seg_lo == seg_hi) without
    truncation.
    """
    N = xs.shape[0]
    idx = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    inwin = (idx >= lo[None, :]) & (idx < hi[None, :])
    low_cand = inwin & ((center[None, :] - xs) > spread[None, :] * siglow)
    high_cand = inwin & ((xs - center[None, :]) > spread[None, :] * sighigh)
    cand = low_cand | high_cand
    n_cur = hi - lo
    max_acc = jnp.maximum(n_cur - r - 4, 0)
    # rank in frame order (ascending values); guard accepts first max_acc
    rank = jnp.cumsum(cand.astype(jnp.int32), axis=0)
    accept = cand & (rank <= max_acc[None, :]) & active[None, :]
    n_low = (accept & low_cand).sum(axis=0).astype(jnp.int32)
    n_high = (accept & high_cand).sum(axis=0).astype(jnp.int32)
    cand_high = (high_cand & active[None, :]).sum(axis=0).astype(jnp.int32)
    trunc = (n_high > 0) & (n_high < cand_high)
    new_lo = lo + n_low
    new_hi = hi - jnp.where(trunc, cand_high, n_high)
    seg_lo = jnp.where(trunc, hi - cand_high + n_high, 0)
    seg_hi = jnp.where(trunc, hi, 0)
    new_r = r + n_low + n_high
    changed = (n_low + n_high) > 0
    return new_lo, new_hi, new_r, changed, n_low, n_high, seg_lo, seg_hi


def _sigma_or_mad(xs, nvalid, siglow, sighigh, use_mad: bool, max_iter: int):
    """SIGMA / MAD rejection (rejection_float.c:172-208)."""
    P = xs.shape[1]
    lo = jnp.zeros(P, jnp.int32)
    hi = nvalid.astype(jnp.int32)
    r = jnp.zeros(P, jnp.int32)
    rejl = jnp.zeros(P, jnp.int32)
    rejh = jnp.zeros(P, jnp.int32)
    s1, s2 = _window_sums(xs)
    median0 = _window_median(xs, lo, hi)
    # "mostly zero" guard: median==0 → reject everything (caller falls back)
    dead = (median0 == 0.0) | (nvalid <= 1)

    def spread_fn(lo_, hi_, med_):
        if use_mad:
            # MAD of the sorted window around med: median of |x−med| over win
            idx = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
            inwin = (idx >= lo_[None, :]) & (idx < hi_[None, :])
            d = jnp.where(inwin, jnp.abs(xs - med_[None, :]), _INF)
            ds = jnp.sort(d, axis=0)
            n = hi_ - lo_
            return _window_median(ds, jnp.zeros_like(n), n)
        _, sd = _window_mean_sd(s1, s2, lo_, hi_)
        return sd

    def body(state):
        (lo_, hi_, r_, rejl_, rejh_, med_, first, active, _,
         sl_, sh_) = state
        spread = spread_fn(lo_, hi_, med_)
        med_new = jnp.where(first, med_, _window_median(xs, lo_, hi_))
        nlo, nhi, nr, changed, n_low, n_high, seg_lo, seg_hi = \
            _clip_window(xs, lo_, hi_, r_, med_new, spread, siglow,
                         sighigh, active)
        act_next = active & changed & ((nhi - nlo) > 3)
        # a truncation is terminal, so an existing segment is never
        # overwritten — keep the first one recorded
        new_seg = seg_hi > seg_lo
        return (nlo, nhi, nr, rejl_ + n_low, rejh_ + n_high,
                med_new, jnp.zeros_like(first), act_next, changed.any(),
                jnp.where(new_seg, seg_lo, sl_),
                jnp.where(new_seg, seg_hi, sh_))

    def cond(state):
        return state[8]

    first = jnp.ones(P, bool)
    active = ~dead
    state = (lo, hi, r, rejl, rejh, median0, first, active,
             jnp.array(True), jnp.zeros(P, jnp.int32),
             jnp.zeros(P, jnp.int32))
    # bounded while: at most N rejection rounds
    state = lax.while_loop(cond, body, state)
    lo, hi, r, rejl, rejh = state[0], state[1], state[2], state[3], state[4]
    seg_lo, seg_hi = state[9], state[10]
    hi = jnp.where(dead, jnp.zeros_like(hi), hi)
    lo = jnp.where(dead, jnp.zeros_like(lo), lo)
    seg_hi = jnp.where(dead, jnp.zeros_like(seg_hi), seg_hi)
    return lo, hi, rejl, rejh, seg_lo, seg_hi


def _percentile(xs, nvalid, plow, phigh):
    """PERCENTILE clipping (rejection_float.c:31-43): single pass,
    reject if median−x > median·plow or x−median > median·phigh."""
    P = xs.shape[1]
    lo = jnp.zeros(P, jnp.int32)
    hi = nvalid.astype(jnp.int32)
    med = _window_median(xs, lo, hi)
    dead = (med == 0.0) | (nvalid <= 1)
    idx = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    inwin = idx < hi[None, :]
    low = inwin & ((med[None, :] - xs) > med[None, :] * plow)
    high = inwin & ((xs - med[None, :]) > med[None, :] * phigh)
    n_low = low.sum(axis=0).astype(jnp.int32)
    n_high = high.sum(axis=0).astype(jnp.int32)
    lo = jnp.where(dead, 0, n_low)
    hi = jnp.where(dead, 0, hi - n_high)
    zero = jnp.zeros(P, jnp.int32)
    return lo, hi, jnp.where(dead, zero, n_low), jnp.where(dead, zero, n_high)


def _winsorized(xs, nvalid, siglow, sighigh, max_iter: int):
    """WINSORIZED sigma clipping (rejection_float.c:222-257)."""
    P = xs.shape[1]
    lo = jnp.zeros(P, jnp.int32)
    hi = nvalid.astype(jnp.int32)
    r = jnp.zeros(P, jnp.int32)
    rejl = jnp.zeros(P, jnp.int32)
    rejh = jnp.zeros(P, jnp.int32)
    s1, s2 = _window_sums(xs)
    idx = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    dead = nvalid <= 1

    def winsor_sd(lo_, hi_, med_):
        """Iterated winsorized sigma — EXACT C iteration
        (rejection_float.c:222-236): σ starts at the plain window sd,
        the clamp applies to the ACCUMULATED w (each round re-clips the
        previous w, not the original values — ``w_stack`` in C), and
        the loop exits when |σ−σ0| ≤ 5e-4·σ0.  On bimodal stacks the
        accumulated-clip fixed point differs from re-clipping the
        originals (found by an adversarial guard-truncation fixture).

        Per-PIXEL convergence freeze (the C loop exits per pixel; a
        batch-wide `.any()` kept refining converged lanes until the
        slowest pixel finished) + Aitken Δ² extrapolation every third
        step for the slow-converging tail — σ is monotone non-
        increasing under accumulated clipping, so the guarded jump
        stays consistent with the not-yet-applied clips.  Same
        structure as the Pallas kernel (pallas/reject_stack.py
        winsor_sd) so both paths produce identical σ trajectories."""
        _, sd0 = _window_mean_sd(s1, s2, lo_, hi_)
        inwin = (idx >= lo_[None, :]) & (idx < hi_[None, :])
        n = jnp.maximum((hi_ - lo_).astype(jnp.float32), 1.0)

        def plain(st):
            w, sigma, h1, h2, frozen, it = st
            m0 = med_ - 1.5 * sigma
            m1 = med_ + 1.5 * sigma
            w2 = jnp.clip(w, m0[None, :], m1[None, :])
            wm = jnp.where(inwin, w2, 0.0)
            t1 = wm.sum(axis=0)
            mean = t1 / n
            var = (jnp.where(inwin, (w2 - mean) ** 2, 0.0)).sum(axis=0) / \
                jnp.maximum(n - 1.0, 1.0)
            new_sig = 1.134 * jnp.sqrt(jnp.maximum(var, 0.0))
            conv = jnp.abs(new_sig - sigma) <= sigma * 5e-4
            return (jnp.where(frozen[None, :], w, w2),
                    jnp.where(frozen, sigma, new_sig), sigma, h1,
                    frozen | conv, it + 1)

        def wbody(st):
            st = plain(plain(plain(st)))
            w, sk, h1, h2, frozen, it = st
            den = sk - 2.0 * h1 + h2
            num = (sk - h1) * (sk - h1)
            ok = jnp.abs(den) > 1e-12
            sa = sk - num / jnp.where(ok, den, 1.0)
            good = ok & (sa > 0.0) & (jnp.abs(sa - sk) < sk) & ~frozen
            return w, jnp.where(good, sa, sk), h1, h2, frozen, it

        def wcond(st):
            return (~st[4]).any() & (st[5] < 48)

        st0 = (xs, sd0, sd0 + 1.0, jnp.zeros_like(sd0),
               (hi_ - lo_) <= 1, jnp.int32(0))
        _, sig, _, _, _, _ = lax.while_loop(wcond, wbody, st0)
        return sig

    def body(state):
        lo_, hi_, r_, rejl_, rejh_, active, _, sl_, sh_ = state
        med = _window_median(xs, lo_, hi_)
        sig = winsor_sd(lo_, hi_, med)
        nlo, nhi, nr, changed, n_low, n_high, seg_lo, seg_hi = \
            _clip_window(xs, lo_, hi_, r_, med, sig, siglow, sighigh,
                         active)
        act_next = active & changed & ((nhi - nlo) > 3)
        new_seg = seg_hi > seg_lo
        return (nlo, nhi, nr, rejl_ + n_low, rejh_ + n_high, act_next,
                changed.any(),
                jnp.where(new_seg, seg_lo, sl_),
                jnp.where(new_seg, seg_hi, sh_))

    state = (lo, hi, r, rejl, rejh, ~dead, jnp.array(True),
             jnp.zeros(P, jnp.int32), jnp.zeros(P, jnp.int32))
    state = lax.while_loop(lambda s: s[6], body, state)
    lo, hi, rejl, rejh = state[0], state[1], state[3], state[4]
    return lo, hi, rejl, rejh, state[7], state[8]


# ---------------------------------------------------------------------------
# SIGMEDIAN — replace rejected with median until stable
# ---------------------------------------------------------------------------


def _sigmedian(xs, nvalid, siglow, sighigh):
    """(rejection_float.c:210-221): rejected values are replaced by the
    current median; loop until no replacement.  Kept count never shrinks."""
    P = xs.shape[1]
    idx = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    valid = idx < nvalid[None, :].astype(jnp.int32)

    def body(state):
        x, rejl, rejh, _ = state
        med = _mask_median(x, valid)
        _, sd = _mask_mean_sd(x, valid)
        low = valid & ((med[None, :] - x) > sd[None, :] * siglow)
        high = valid & ((x - med[None, :]) > sd[None, :] * sighigh)
        x2 = jnp.where(low | high, med[None, :], x)
        n_rep = (low | high).sum()
        return (x2, rejl + low.sum(axis=0).astype(jnp.int32),
                rejh + high.sum(axis=0).astype(jnp.int32), n_rep > 0)

    zero = jnp.zeros(P, jnp.int32)
    state = (xs, zero, zero, jnp.array(True))
    state = lax.while_loop(lambda s: s[3], body, state)
    x, rejl, rejh = state[0], state[1], state[2]
    return x, rejl, rejh


# ---------------------------------------------------------------------------
# LINEARFIT — temporal linear fit on sorted values
# ---------------------------------------------------------------------------


def _linearfit(xs, nvalid, siglow, sighigh, n_full: int):
    """(rejection_float.c:259-300): fit y = b + a·i over the *sorted* kept
    values (i = position in compacted array), σ = mean |residual|, clip.

    m_x and m_dx2 are the FULL-size constants (median_and_mean.c:1491-1499
    precomputes them once for nb_frames) — replicated quirk.
    """
    P = xs.shape[1]
    m_x = (n_full - 1) * 0.5
    ii = np.arange(n_full, dtype=np.float64)
    m_dx2_run = 0.0
    for j in range(n_full):
        dx = j - m_x
        m_dx2_run += (dx * dx - m_dx2_run) / (j + 1)
    inv_mdx2 = np.float32(1.0 / m_dx2_run) if m_dx2_run else np.float32(0.0)

    idx = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    valid0 = idx < nvalid[None, :].astype(jnp.int32)

    def fit(keep):
        """siril_fit_linear over kept entries with positions = rank."""
        pos = jnp.cumsum(keep.astype(jnp.float32), axis=0) - 1.0  # i of kept
        n = keep.sum(axis=0).astype(jnp.float32)
        nsafe = jnp.maximum(n, 1.0)
        m_y = jnp.where(keep, xs, 0.0).sum(axis=0) / nsafe
        dx = pos - m_x
        dy = xs - m_y[None, :]
        m_dxdy = jnp.where(keep, dx * dy, 0.0).sum(axis=0) / nsafe
        a = m_dxdy * inv_mdx2          # slope
        b = m_y - m_x * a              # intercept
        return a, b, pos, n

    def body(state):
        keep, r, rejl, rejh, active, _ = state
        a, b, pos, n = fit(keep)
        line = a[None, :] * pos + b[None, :]
        resid = xs - line
        sigma = jnp.where(keep, jnp.abs(resid), 0.0).sum(axis=0) / jnp.maximum(n, 1.0)
        low_cand = keep & ((-resid) > sigma[None, :] * siglow)
        high_cand = keep & (resid > sigma[None, :] * sighigh)
        cand = low_cand | high_cand
        max_acc = jnp.maximum(n.astype(jnp.int32) - r - 4, 0)
        rank = jnp.cumsum(cand.astype(jnp.int32), axis=0)
        accept = cand & (rank <= max_acc[None, :]) & active[None, :]
        n_low = (accept & low_cand).sum(axis=0).astype(jnp.int32)
        n_high = (accept & high_cand).sum(axis=0).astype(jnp.int32)
        keep2 = keep & ~accept
        n_new = keep2.sum(axis=0)
        changed = (n_low + n_high) > 0
        act_next = active & changed & (n_new > 3)
        return (keep2, r + n_low + n_high, rejl + n_low, rejh + n_high,
                act_next, changed.any())

    P_ = P
    zero = jnp.zeros(P_, jnp.int32)
    state = (valid0, zero, zero, zero, nvalid > 1, jnp.array(True))
    state = lax.while_loop(lambda s: s[5], body, state)
    keep, rejl, rejh = state[0], state[2], state[3]
    return keep, rejl, rejh


# ---------------------------------------------------------------------------
# GESDT — generalized extreme studentized deviate test
# ---------------------------------------------------------------------------


def gesdt_critical_values(nb_frames: int, alpha: float, max_outliers: int) -> np.ndarray:
    """λ_j table (median_and_mean.c:1479-1486), host-side via scipy."""
    from scipy.stats import t as tdist

    crit = np.zeros(max(max_outliers, 1), dtype=np.float32)
    size = nb_frames
    for j in range(max_outliers):
        df = size - 2
        if df <= 0:
            crit[j] = np.inf
            continue
        tq = tdist.ppf(1.0 - alpha / (2.0 * size), df)
        crit[j] = (size - 1) * tq / (np.sqrt(size) * np.sqrt(size - 2 + tq * tq))
        size -= 1
    return crit


def _gesdt(xs, nvalid, critical, max_outliers: int, n_frames: int):
    """(rejection_float.c:302-345 + confirm_outliers).

    Walk: at each step compute Grubbs G over the current sorted window,
    remove the max-deviation end (low end wins ties), record whether
    G > λ_step.  Afterwards confirm all steps up to the last flagged one
    (minimum index 1 — the reference always confirms steps 0..1 once it
    scans; replicated).  Low removals reject xs[lo]; high removals reject
    the recorded *shrunk-array* index (reference quirk).
    """
    N, P = xs.shape
    s1, s2 = _window_sums(xs)
    lo0 = jnp.zeros(P, jnp.int32)
    hi0 = nvalid.astype(jnp.int32)
    med = _window_median(xs, lo0, hi0)
    removed = (jnp.full(P, n_frames, jnp.int32) - nvalid.astype(jnp.int32))
    # more zeros already removed than the outlier budget → no rejection
    budget_ok = removed < max_outliers

    def step(carry, j):
        lo, hi = carry
        size = hi - lo
        mean, sd = _window_mean_sd(s1, s2, lo, hi)
        first = _select_at(xs, lo)
        last = _select_at(xs, jnp.maximum(hi - 1, 0))
        dev_low = mean - first
        dev_high = last - mean
        take_high = dev_high > dev_low          # strict > (grubbs_stat:88-96)
        maxdev = jnp.where(take_high, dev_high, dev_low)
        g = maxdev / jnp.maximum(sd, 1e-30)
        crit_j = critical[jnp.minimum(removed + j, critical.shape[0] - 1)]
        flagged = (g > crit_j) & (size > 2)
        x_rm = jnp.where(take_high, last, first)
        # recorded index: low → lo (true sorted index); high → size-1
        # (reference records the shrunk-array index, rejection_float.c:332)
        rec = jnp.where(take_high, size - 1, lo)
        new_lo = jnp.where(take_high, lo, lo + 1)
        new_hi = jnp.where(take_high, hi - 1, hi)
        valid_step = (j < (max_outliers - removed)) & (size > 1)
        new_lo = jnp.where(valid_step, new_lo, lo)
        new_hi = jnp.where(valid_step, new_hi, hi)
        return (new_lo, new_hi), (flagged & valid_step, x_rm, rec,
                                  take_high, valid_step)

    (_, _), (flags, xvals, recs, highs, valids) = lax.scan(
        step, (lo0, hi0), jnp.arange(max_outliers))
    # flags etc: (max_outliers, P)

    # confirm_outliers: i = last flagged step (but never below 1), confirm 0..i
    steps = jnp.arange(max_outliers)[:, None]
    last_flag = jnp.max(jnp.where(flags, steps, -1), axis=0)
    i_conf = jnp.maximum(last_flag, jnp.minimum(1, max_outliers - 1))
    confirmed = (steps <= i_conf[None, :]) & valids
    is_high_val = xvals >= med[None, :]
    rejl = (confirmed & ~is_high_val).sum(axis=0).astype(jnp.int32)
    rejh = (confirmed & is_high_val).sum(axis=0).astype(jnp.int32)
    rejl = jnp.where(budget_ok, rejl, 0)
    rejh = jnp.where(budget_ok, rejh, 0)

    # build keep mask over sorted xs from recorded indices
    keep = lax.broadcasted_iota(jnp.int32, xs.shape, 0) < nvalid[None, :]
    onehots = jax.nn.one_hot(recs, N, dtype=jnp.bool_, axis=1)  # (M, N, P)
    rej_mask = jnp.any(onehots & confirmed[:, None, :], axis=0)
    keep = keep & ~(rej_mask & budget_ok[None, :])
    return keep, rejl, rejh


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("rtype", "n_full", "max_outliers",
                                   "with_weights"))
def rejection_mean(stack, rtype: int, siglow: float, sighigh: float,
                   weights=None, critical=None, n_full: int = 0,
                   max_outliers: int = 0, with_weights: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reject + mean one tile.  stack: (N, P) normalized frame values.

    Returns (mean, rej_low, rej_high) each of shape (P,).
    ``weights``: optional (N, P) combined weight (frame weights × drizzle ×
    feather mask), applied via the reference's [pmin,pmax] membership rule
    (median_and_mean.c:1041-1075).
    """
    N, P = stack.shape
    n_full = n_full or N
    siglow = jnp.float32(siglow)
    sighigh = jnp.float32(sighigh)

    finite = jnp.isfinite(stack)
    valid = (stack != 0.0) & finite
    nvalid = valid.sum(axis=0).astype(jnp.int32)
    xs = jnp.sort(jnp.where(valid, stack, _INF), axis=0)

    zero = jnp.zeros(P, jnp.int32)

    if rtype == NO_REJEC:
        lo, hi, rejl, rejh = zero, nvalid, zero, zero
        keep_sorted = _window_mask(xs.shape, lo, hi)
        values = xs
    elif rtype == PERCENTILE:
        lo, hi, rejl, rejh = _percentile(xs, nvalid, siglow, sighigh)
        keep_sorted = _window_mask(xs.shape, lo, hi)
        values = xs
    elif rtype in (SIGMA, MAD):
        lo, hi, rejl, rejh, seg_lo, seg_hi = _sigma_or_mad(
            xs, nvalid, siglow, sighigh, rtype == MAD, N)
        # kept = window ∪ the guard-truncated kept-top segment (the C
        # ascending scan keeps the LARGEST high candidates once N−r≤4)
        keep_sorted = _window_mask(xs.shape, lo, hi) | \
            _window_mask(xs.shape, seg_lo, seg_hi)
        values = xs
    elif rtype == WINSORIZED:
        lo, hi, rejl, rejh, seg_lo, seg_hi = _winsorized(
            xs, nvalid, siglow, sighigh, N)
        keep_sorted = _window_mask(xs.shape, lo, hi) | \
            _window_mask(xs.shape, seg_lo, seg_hi)
        values = xs
    elif rtype == SIGMEDIAN:
        values, rejl, rejh = _sigmedian(xs, nvalid, siglow, sighigh)
        keep_sorted = lax.broadcasted_iota(jnp.int32, xs.shape, 0) < nvalid[None, :]
    elif rtype == LINEARFIT:
        keep_sorted, rejl, rejh = _linearfit(xs, nvalid, siglow, sighigh, n_full)
        values = xs
    elif rtype == GESDT:
        keep_sorted, rejl, rejh = _gesdt(xs, nvalid, critical, max_outliers, n_full)
        values = xs
    else:
        raise ValueError(f"unknown rejection type {rtype}")

    # guard: kept<=1 before rejection → keep as-is (rejection_float.c:141)
    trivial = nvalid <= 1
    keep_sorted = jnp.where(trivial[None, :],
                            lax.broadcasted_iota(jnp.int32, xs.shape, 0)
                            < nvalid[None, :],
                            keep_sorted)
    rejl = jnp.where(trivial, 0, rejl)
    rejh = jnp.where(trivial, 0, rejh)

    nkept = keep_sorted.sum(axis=0).astype(jnp.float32)
    sum_kept = jnp.where(keep_sorted, values, 0.0).sum(axis=0)
    mean_plain = sum_kept / jnp.maximum(nkept, 1.0)

    # kept==0 → median of the original (zeros included) stack
    med_all = jnp.median(stack, axis=0)
    mean = jnp.where(nkept > 0, mean_plain, med_all)

    if with_weights and weights is not None:
        # pmin/pmax over kept values, then weighted mean over the ORIGINAL
        # stack of entries in [pmin, pmax] and != 0 (mean_and_reject float
        # path, median_and_mean.c:1041-1095)
        pmin = jnp.min(jnp.where(keep_sorted, values, _INF), axis=0)
        pmax = jnp.max(jnp.where(keep_sorted, values, -_INF), axis=0)
        inrange = (stack >= pmin[None, :]) & (stack <= pmax[None, :]) & \
            (stack != 0.0)
        wsum = jnp.where(inrange, stack * weights, 0.0).sum(axis=0)
        wnorm = jnp.where(inrange, weights, 0.0).sum(axis=0)
        fallback = jnp.where(inrange & (stack > 0), stack, 0.0).sum(axis=0) / \
            jnp.maximum(nkept, 1.0)
        wmean = jnp.where((wnorm != 0.0) & (wsum != 0.0), wsum / wnorm, fallback)
        mean = jnp.where(nkept > 0, wmean, med_all)

    return mean, rejl, rejh


def _window_mask(shape, lo, hi):
    idx = lax.broadcasted_iota(jnp.int32, shape, 0)
    return (idx >= lo[None, :]) & (idx < hi[None, :])


@jax.jit
def median_stack(stack):
    """Median stacking (stack_median): per-pixel median over ALL frame
    values including zeros (quickmedian over nb_frames,
    median_and_mean.c:1712-1716)."""
    return jnp.median(stack, axis=0)
