"""Fused rejection-stack Pallas kernel — the primary hot path, hand-tiled.

Semantic spec: ``mean_and_reject`` (reference src/stacking/median_and_mean.c:956)
and ``apply_rejection_float`` (rejection_float.c:100), with exactly the
semantics of the vectorized jnp formulation in ``siril_tpu/ops/rejection.py``
(which is itself parity-tested against reference formulas).  This kernel is
parity-tested against that jnp path (tests/test_pallas_reject.py).

Why Pallas: the jnp path sorts and then iterates clipping rounds as
full-array ``lax.while_loop`` bodies — every round re-reads the (N, P)
stack from HBM several times.  Here the whole pipeline for one pixel tile
(u16 decode → per-frame normalization → sort → clipping iterations → mean)
runs with the (N, TILE) stack resident in VMEM: HBM traffic is ONE read of
the raw input (2 bytes/element for u16 sources) plus three (1, TILE)
output rows.  Convergence is also per-tile instead of per-block: a tile
whose pixels all converge in one round exits its while loop immediately.

Algorithms used (all VPU-friendly, no gathers, no data-dependent shapes):

- **Sort**: Batcher bitonic network over the frame axis, expressed as
  ``pltpu.roll`` compare-exchanges with static per-stage masks —
  O(N log² N) elementwise min/max over the tile.
- **Window clipping** (sigma / winsorized / percentile / MAD): after the
  sort, the kept set is a contiguous window [lo, hi) per pixel; each
  round is O(N) masked reductions.  The reference's cumulative
  ``N − r ≤ 4`` guard resolves in closed form — low-side candidates are a
  prefix of the window and high-side a suffix, so
  ``n_low = min(cand_low, max_acc)``, ``n_high = min(cand_high,
  max_acc − n_low)`` — no per-pixel cumulative scan needed.
- **MAD spread**: |xs − med| restricted to a sorted window first
  decreases then increases — a bitonic sequence — so a single
  log₂N-stage bitonic *merge* (not a full sort) orders it.
- **Median incl. zeros fallback**: the merged order of the (N−nvalid)
  removed zeros and the sorted non-zero window is computed analytically
  from the count of negative entries (two masked selects), avoiding a
  second sort.

Mosaic constraint shaping the code: ``lax.while_loop`` carries of
(1, T) replicated-sublane vectors fail to legalize (scf.yield), so ALL
per-pixel iteration state lives in VMEM scratch refs and the loop carries
only scalars.

All 8 rejection modes are implemented (round 3 extended SIGMEDIAN /
LINEARFIT / GESDT, previously jnp-path fallbacks whose ``lax.while_loop``
formulations cold-compiled in ~7 minutes through the remote-compile
tunnel — Mosaic compiles these in seconds):

- **SIGMEDIAN** (rejection_float.c:210-221): rejected values are
  *replaced* by the running median, so the sorted array changes every
  round — each round re-sorts with the bitonic network (rounds are few).
- **LINEARFIT** (rejection_float.c:259-300): the kept set is a mask, not
  a window; per-entry positions (= rank among kept) and the cumulative
  N−r≤4 guard use a Hillis–Steele log-step prefix sum built from
  ``pltpu.roll``.
- **GESDT** (rejection_float.c:302-345): the confirm_outliers rule
  confirms a *prefix* of walk steps, so no per-step storage is needed:
  pass 1 walks the window recording only the last flagged step, pass 2
  replays the walk marking rejections for steps ≤ the confirm index.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from siril_tpu.ops.rejection import (
    NO_REJEC, PERCENTILE, SIGMA, MAD, SIGMEDIAN, WINSORIZED, LINEARFIT,
    GESDT,
)
from siril_tpu.ops.normalization import NO_NORM, ADDITIVE, ADDITIVE_SCALING

_INF = float("inf")   # plain float: jnp scalars would be captured tracers

#: rejection modes this kernel implements (all 8)
PALLAS_RTYPES = frozenset({NO_REJEC, PERCENTILE, SIGMA, MAD, SIGMEDIAN,
                           WINSORIZED, LINEARFIT, GESDT})

# rows in the int32 state scratch; _SL/_SH hold the guard-truncated
# kept-top segment of the window modes (SIGMA/MAD/WINSORIZED) and are
# only aliased with _LF by GESDT, which uses neither
_LO, _HI, _R, _RL, _RH, _FIRST, _LF = 0, 1, 2, 3, 4, 5, 6
_SL, _SH = 6, 7


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _roll0(x, shift: int):
    """Circular shift along axis 0 (frame axis); pltpu.roll wants shift ≥ 0."""
    return pltpu.roll(x, shift % x.shape[0], axis=0)


def _cmp_exchange(x, j: int, k: int):
    """One bitonic compare-exchange stage at distance j within k-blocks.

    Static masks: element i pairs with i^j; ascending iff (i & k) == 0.
    """
    i = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    partner_up = _roll0(x, -j)      # value at i + j
    partner_dn = _roll0(x, j)       # value at i - j
    is_lower = (i & j) == 0         # partner is i + j
    partner = jnp.where(is_lower, partner_up, partner_dn)
    mn = jnp.minimum(x, partner)
    mx = jnp.maximum(x, partner)
    asc = (i & k) == 0
    keep_min = jnp.logical_xor(is_lower, ~asc)   # lower & asc, or upper & desc
    return jnp.where(keep_min, mn, mx)


def _bitonic_sort(x, npad: int):
    """Full ascending bitonic sort along axis 0 (npad must be a power of 2)."""
    k = 2
    while k <= npad:
        j = k // 2
        while j >= 1:
            x = _cmp_exchange(x, j, k)
            j //= 2
        k *= 2
    return x


def _bitonic_merge(x, npad: int):
    """Sort a bitonic (V- or Λ-shaped) sequence: the final merge only."""
    j = npad // 2
    while j >= 1:
        x = _cmp_exchange(x, j, npad)
        j //= 2
    return x


def _cumsum0(a, length: int):
    """Inclusive prefix sum along axis 0 (Hillis–Steele, log₂ steps of
    ``pltpu.roll`` + masked add — no native cumsum on the VPU)."""
    rows = lax.broadcasted_iota(jnp.int32, a.shape, 0)
    s = a
    k = 1
    while k < length:
        sh = _roll0(s, k)                 # value from row i − k
        s = s + jnp.where(rows >= k, sh, jnp.zeros_like(sh))
        k *= 2
    return s


def _select_at(xs, idx_row):
    """xs[idx_row[0, p], p] via mask-reduce; idx_row: (1, T) int32."""
    rows = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    return jnp.where(rows == idx_row, xs, 0.0).sum(axis=0, keepdims=True)


def _window_median(xs, lo, hi):
    """Exact median of sorted xs[lo:hi] per pixel; lo, hi: (1, T) int32."""
    n = jnp.maximum(hi - lo, 1)
    i0 = lo + (n - 1) // 2
    i1 = lo + n // 2
    rows = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    v0 = jnp.where(rows == i0, xs, 0.0).sum(axis=0, keepdims=True)
    v1 = jnp.where(rows == i1, xs, 0.0).sum(axis=0, keepdims=True)
    return 0.5 * (v0 + v1)


def _window_mean_sd(s1, s2, lo, hi):
    """Mean and sample-sd (N−1 denominator) of the window [lo, hi)."""
    rows = lax.broadcasted_iota(jnp.int32, s1.shape, 0)
    inwin = (rows >= lo) & (rows < hi)
    n = (hi - lo).astype(jnp.float32)
    t1 = jnp.where(inwin, s1, 0.0).sum(axis=0, keepdims=True)
    t2 = jnp.where(inwin, s2, 0.0).sum(axis=0, keepdims=True)
    nsafe = jnp.maximum(n, 1.0)
    mean = t1 / nsafe
    var = (t2 - t1 * mean) / jnp.maximum(n - 1.0, 1.0)
    sd = jnp.sqrt(jnp.maximum(var, 0.0))
    return mean, jnp.where(n > 1, sd, 0.0)


def _clip_counts(lo, hi, r, n_low_cand, n_high_cand):
    """Closed-form N−r≤4 guard (rejection_float.c:188-196): low candidates
    precede high candidates in the sorted window, so the 'first max_acc in
    order' rule is two mins.  When the high side truncates
    (n_high < n_high_cand), the ascending C scan rejected the SMALLEST
    high candidates — the caller must keep the top slice
    [hi−cand_high+n_high, hi) as a segment (see _SL/_SH)."""
    n_cur = hi - lo
    max_acc = jnp.maximum(n_cur - r - 4, 0)
    n_low = jnp.minimum(n_low_cand, max_acc)
    n_high = jnp.minimum(n_high_cand, max_acc - n_low)
    return n_low, n_high


def _build_kernel(rtype: int, mode: int, siglow: float, sighigh: float,
                  n: int, npad: int, with_weights: bool, in_dtype,
                  n_full: int = 0, max_outliers: int = 0):
    """Return the pallas kernel body for one static config.

    Scratch refs (allocated by the caller):
      xs_ref:  (npad, T) f32 — sorted stack (+inf padded)
      x_ref:   (n, T)   f32 — normalized unsorted stack
      st_ref:  (8, T)   i32 — rows _LO.._LF of per-pixel loop state
      sf_ref:  (8, T)   f32 — rows 0..2: med / sigma / sigma0
      aux_ref: (npad, T) i32 — keep mask (LINEARFIT / GESDT)
      wacc_ref: (npad, T) f32 — accumulated winsorized w (WINSORIZED)
    """
    siglow = float(siglow)
    sighigh = float(sighigh)
    n_full = n_full or n

    def candidates(xs, lo, hi, center, spread):
        rows = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
        inwin = (rows >= lo) & (rows < hi)
        low = inwin & ((center - xs) > spread * siglow)
        high = inwin & ((xs - center) > spread * sighigh)
        nl = low.sum(axis=0, keepdims=True).astype(jnp.int32)
        nh = high.sum(axis=0, keepdims=True).astype(jnp.int32)
        return nl, nh

    def mad_spread(xs, lo, hi, med):
        rows = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
        inwin = (rows >= lo) & (rows < hi)
        d = jnp.where(inwin, jnp.abs(xs - med), _INF)
        ds = _bitonic_merge(d, npad)   # V-shaped ⇒ merge suffices
        n_w = hi - lo
        return _window_median(ds, jnp.zeros_like(n_w), n_w)

    def kernel(stack_ref, scale_ref, offset_ref, mul_ref, w_ref, crit_ref,
               mean_ref, rejl_ref, rejh_ref, xs_ref, x_ref, st_ref, sf_ref,
               aux_ref, wacc_ref):
        x = stack_ref[:]
        if in_dtype == jnp.int16:
            # raw FITS i16 (BZERO 32768) → [0,1] (image_format_fits.c:449)
            x = (x.astype(jnp.float32) + 32768.0) * (1.0 / 65535.0)
        else:
            x = x.astype(jnp.float32)
        # per-frame normalization (normalization.c application step)
        if mode in (ADDITIVE, ADDITIVE_SCALING):
            out = x * scale_ref[:] - offset_ref[:]
            x = jnp.where(x != 0.0, out, 0.0)
        elif mode != NO_NORM:
            x = x * scale_ref[:] * mul_ref[:]
        x_ref[:] = x

        T = x.shape[1]
        valid = (x != 0.0) & jnp.isfinite(x)
        nvalid = valid.sum(axis=0, keepdims=True).astype(jnp.int32)
        xv = jnp.where(valid, x, _INF)
        if npad > n:
            pad = jnp.full((npad - n, T), _INF, jnp.float32)
            xv = jnp.concatenate([xv, pad], axis=0)
        xs_ref[:] = _bitonic_sort(xv, npad)
        xs = xs_ref[:]
        s1 = jnp.where(jnp.isfinite(xs), xs, 0.0)
        s2 = s1 * s1

        zero = jnp.zeros((1, T), jnp.int32)
        lo0, hi0 = zero, nvalid
        median0 = _window_median(xs, lo0, hi0)

        if rtype == NO_REJEC:
            lo, hi, rejl, rejh = lo0, hi0, zero, zero

        elif rtype == PERCENTILE:
            # rejection_float.c:31-43 — single pass vs the median
            dead = (median0 == 0.0) | (nvalid <= 1)
            rows = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
            inwin = rows < hi0
            low = inwin & ((median0 - xs) > median0 * siglow)
            high = inwin & ((xs - median0) > median0 * sighigh)
            n_low = low.sum(axis=0, keepdims=True).astype(jnp.int32)
            n_high = high.sum(axis=0, keepdims=True).astype(jnp.int32)
            lo = jnp.where(dead, 0, n_low)
            hi = jnp.where(dead, 0, hi0 - n_high)
            rejl = jnp.where(dead, zero, n_low)
            rejh = jnp.where(dead, zero, n_high)

        elif rtype in (SIGMA, MAD):
            dead = (median0 == 0.0) | (nvalid <= 1)
            st_ref[_LO:_LO + 1] = lo0
            st_ref[_HI:_HI + 1] = hi0
            st_ref[_R:_R + 1] = zero
            st_ref[_RL:_RL + 1] = zero
            st_ref[_RH:_RH + 1] = zero
            st_ref[_SL:_SL + 1] = zero
            st_ref[_SH:_SH + 1] = zero
            st_ref[_FIRST:_FIRST + 1] = jnp.where(dead, 0, 1)  # 1=active+first
            sf_ref[0:1] = median0

            def spread_fn(lo_, hi_, med_):
                if rtype == MAD:
                    return mad_spread(xs, lo_, hi_, med_)
                _, sd = _window_mean_sd(s1, s2, lo_, hi_)
                return sd

            def body(carry):
                lo_ = st_ref[_LO:_LO + 1]
                hi_ = st_ref[_HI:_HI + 1]
                r_ = st_ref[_R:_R + 1]
                flags = st_ref[_FIRST:_FIRST + 1]   # 0 inactive, 1 first, 2 later
                active = flags > 0
                med_ = sf_ref[0:1]
                spread = spread_fn(lo_, hi_, med_)
                med_new = jnp.where(flags == 1, med_,
                                    _window_median(xs, lo_, hi_))
                ncl, nch = candidates(xs, lo_, hi_, med_new, spread)
                ncl = jnp.where(active, ncl, 0)
                nch = jnp.where(active, nch, 0)
                n_low, n_high = _clip_counts(lo_, hi_, r_, ncl, nch)
                # truncated high side: ascending scan keeps the TOP of
                # the suffix — record it as the kept segment (terminal:
                # next round's budget is negative, so at most one ever)
                trunc = (n_high > 0) & (n_high < nch)
                nlo = lo_ + n_low
                nhi = hi_ - jnp.where(trunc, nch, n_high)
                st_ref[_SL:_SL + 1] = jnp.where(
                    trunc, hi_ - nch + n_high, st_ref[_SL:_SL + 1])
                st_ref[_SH:_SH + 1] = jnp.where(
                    trunc, hi_, st_ref[_SH:_SH + 1])
                changed = (n_low + n_high) > 0
                act_next = active & changed & ((nhi - nlo) > 3)
                st_ref[_LO:_LO + 1] = nlo
                st_ref[_HI:_HI + 1] = nhi
                st_ref[_R:_R + 1] = r_ + n_low + n_high
                st_ref[_RL:_RL + 1] = st_ref[_RL:_RL + 1] + n_low
                st_ref[_RH:_RH + 1] = st_ref[_RH:_RH + 1] + n_high
                st_ref[_FIRST:_FIRST + 1] = jnp.where(act_next, 2, 0)
                sf_ref[0:1] = med_new
                return carry + 1, changed.any()

            def cond(carry):
                return carry[1]

            lax.while_loop(lambda c: c[1],
                           lambda c: body(c[0]),
                           (jnp.int32(0), jnp.array(True)))
            lo = st_ref[_LO:_LO + 1]
            hi = st_ref[_HI:_HI + 1]
            rejl = st_ref[_RL:_RL + 1]
            rejh = st_ref[_RH:_RH + 1]
            hi = jnp.where(dead, zero, hi)
            lo = jnp.where(dead, zero, lo)

        elif rtype == WINSORIZED:
            dead = nvalid <= 1
            rows = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
            st_ref[_LO:_LO + 1] = lo0
            st_ref[_HI:_HI + 1] = hi0
            st_ref[_R:_R + 1] = zero
            st_ref[_RL:_RL + 1] = zero
            st_ref[_RH:_RH + 1] = zero
            st_ref[_SL:_SL + 1] = zero
            st_ref[_SH:_SH + 1] = zero
            st_ref[_FIRST:_FIRST + 1] = jnp.where(dead, 0, 1)

            def winsor_sd(lo_, hi_, med_):
                # EXACT C iteration (rejection_float.c:222-236): σ
                # starts at the PLAIN window sd, and the clamp applies
                # to the ACCUMULATED w (each round re-clips the previous
                # w — C's w_stack — not the original values; on bimodal
                # stacks the fixed points differ), until
                # |σ−σ0| ≤ 5e-4·σ0.
                #
                # Per-PIXEL convergence freeze (the C loop is per pixel;
                # the old tile-wide `.any()` kept refining already-
                # converged pixels' σ until the slowest lane finished —
                # mean per-pixel iterations ≈ 6, tile-max ≈ 46, i.e.
                # ~85% wasted body work) + Aitken Δ² extrapolation every
                # third step for the slow linear-convergence tail
                # (bimodal hot-pixel columns), with the loop condition
                # checked once per 3 plain steps to amortize the
                # vector→scalar sync.  A frozen lane's σ is the first
                # σ_k with |σ_k−σ_{k−1}| ≤ 5e-4·σ_{k−1} — exactly the C
                # per-pixel exit value; the Aitken jump only moves a
                # NOT-yet-converged lane's σ (its accumulated w catches
                # up on the following plain steps — σ is monotone non-
                # increasing under accumulated clipping).
                _, sd0 = _window_mean_sd(s1, s2, lo_, hi_)
                inwin = (rows >= lo_) & (rows < hi_)
                n_w = jnp.maximum((hi_ - lo_).astype(jnp.float32), 1.0)
                wacc_ref[:] = xs
                sf_ref[1:2] = sd0                          # σ_k
                sf_ref[2:3] = sd0 + 1.0                    # σ_{k−1}
                sf_ref[3:4] = jnp.zeros_like(sd0)          # σ_{k−2}
                sf_ref[4:5] = jnp.where((hi_ - lo_) > 1,
                                        0.0, 1.0)          # frozen mask

                def plain_step():
                    sigma = sf_ref[1:2]
                    frozen = sf_ref[4:5] > 0.5
                    m0 = med_ - 1.5 * sigma
                    m1 = med_ + 1.5 * sigma
                    w2 = jnp.clip(wacc_ref[:], m0, m1)
                    wm = jnp.where(inwin, w2, 0.0)
                    t1 = wm.sum(axis=0, keepdims=True)
                    mn = t1 / n_w
                    var = (jnp.where(inwin, (w2 - mn) ** 2, 0.0)
                           ).sum(axis=0, keepdims=True) / \
                        jnp.maximum(n_w - 1.0, 1.0)
                    newsig = 1.134 * jnp.sqrt(jnp.maximum(var, 0.0))
                    conv = jnp.abs(newsig - sigma) <= sigma * 5e-4
                    fz = frozen.astype(jnp.float32)
                    wacc_ref[:] = wacc_ref[:] * fz + w2 * (1.0 - fz)
                    sf_ref[3:4] = sf_ref[2:3]
                    sf_ref[2:3] = sigma
                    sf_ref[1:2] = jnp.where(frozen, sigma, newsig)
                    sf_ref[4:5] = jnp.where(frozen | conv, 1.0, 0.0)

                def wbody(it):
                    plain_step()
                    plain_step()
                    plain_step()
                    # Aitken Δ²: σ_A = σ_k − (Δσ_k)²/(Δ²σ) on lanes with
                    # a sane denominator; plain steps after the jump
                    # re-establish the convergence check
                    sk = sf_ref[1:2]
                    sk1 = sf_ref[2:3]
                    sk2 = sf_ref[3:4]
                    den = sk - 2.0 * sk1 + sk2
                    num = (sk - sk1) * (sk - sk1)
                    ok = jnp.abs(den) > 1e-12
                    sa = sk - num / jnp.where(ok, den, 1.0)
                    frozen = sf_ref[4:5] > 0.5
                    good = ok & (sa > 0.0) & (jnp.abs(sa - sk) < sk) & \
                        ~frozen
                    sf_ref[1:2] = jnp.where(good, sa, sk)
                    return it + 3

                def wcond(it):
                    return ((sf_ref[4:5] < 0.5).any() & (it < 48))

                lax.while_loop(wcond, wbody, jnp.int32(0))
                return sf_ref[1:2]

            def body(it):
                lo_ = st_ref[_LO:_LO + 1]
                hi_ = st_ref[_HI:_HI + 1]
                r_ = st_ref[_R:_R + 1]
                active = st_ref[_FIRST:_FIRST + 1] > 0
                med = _window_median(xs, lo_, hi_)
                sig = winsor_sd(lo_, hi_, med)
                ncl, nch = candidates(xs, lo_, hi_, med, sig)
                ncl = jnp.where(active, ncl, 0)
                nch = jnp.where(active, nch, 0)
                n_low, n_high = _clip_counts(lo_, hi_, r_, ncl, nch)
                trunc = (n_high > 0) & (n_high < nch)
                nlo = lo_ + n_low
                nhi = hi_ - jnp.where(trunc, nch, n_high)
                st_ref[_SL:_SL + 1] = jnp.where(
                    trunc, hi_ - nch + n_high, st_ref[_SL:_SL + 1])
                st_ref[_SH:_SH + 1] = jnp.where(
                    trunc, hi_, st_ref[_SH:_SH + 1])
                changed = (n_low + n_high) > 0
                act_next = active & changed & ((nhi - nlo) > 3)
                st_ref[_LO:_LO + 1] = nlo
                st_ref[_HI:_HI + 1] = nhi
                st_ref[_R:_R + 1] = r_ + n_low + n_high
                st_ref[_RL:_RL + 1] = st_ref[_RL:_RL + 1] + n_low
                st_ref[_RH:_RH + 1] = st_ref[_RH:_RH + 1] + n_high
                st_ref[_FIRST:_FIRST + 1] = jnp.where(act_next, 1, 0)
                return it + 1, changed.any()

            lax.while_loop(lambda c: c[1],
                           lambda c: body(c[0]),
                           (jnp.int32(0), jnp.array(True)))
            lo = st_ref[_LO:_LO + 1]
            hi = st_ref[_HI:_HI + 1]
            rejl = st_ref[_RL:_RL + 1]
            rejh = st_ref[_RH:_RH + 1]
        elif rtype == SIGMEDIAN:
            # rejection_float.c:210-221 — rejected values are REPLACED by
            # the running median (kept count never shrinks); the array is
            # re-sorted each round so the median stays a window lookup
            rows = lax.broadcasted_iota(jnp.int32, xs_ref.shape, 0)
            vmask = rows < nvalid
            nv = nvalid.astype(jnp.float32)
            nvs = jnp.maximum(nv, 1.0)
            st_ref[_RL:_RL + 1] = zero
            st_ref[_RH:_RH + 1] = zero
            st_ref[_FIRST:_FIRST + 1] = jnp.where(nvalid > 1, 1, 0)

            def body(it):
                v = xs_ref[:]
                med = _window_median(v, zero, nvalid)
                vv = jnp.where(vmask, v, 0.0)
                mean_v = vv.sum(axis=0, keepdims=True) / nvs
                var = (jnp.where(vmask, (v - mean_v) ** 2, 0.0)
                       ).sum(axis=0, keepdims=True) / jnp.maximum(nv - 1.0,
                                                                  1.0)
                sd = jnp.where(nv > 1, jnp.sqrt(jnp.maximum(var, 0.0)), 0.0)
                active = st_ref[_FIRST:_FIRST + 1] > 0
                low = vmask & ((med - v) > sd * siglow) & active
                high = vmask & ((v - med) > sd * sighigh) & active
                rep = low | high
                xs_ref[:] = _bitonic_sort(jnp.where(rep, med, v), npad)
                st_ref[_RL:_RL + 1] = st_ref[_RL:_RL + 1] + \
                    low.sum(axis=0, keepdims=True).astype(jnp.int32)
                st_ref[_RH:_RH + 1] = st_ref[_RH:_RH + 1] + \
                    high.sum(axis=0, keepdims=True).astype(jnp.int32)
                changed = rep.sum(axis=0, keepdims=True) > 0
                st_ref[_FIRST:_FIRST + 1] = jnp.where(active & changed,
                                                      1, 0)
                return it + 1, changed.any()

            lax.while_loop(lambda c: c[1], lambda c: body(c[0]),
                           (jnp.int32(0), jnp.array(True)))
            lo, hi = lo0, hi0
            rejl = st_ref[_RL:_RL + 1]
            rejh = st_ref[_RH:_RH + 1]
            xs = xs_ref[:]                       # modified values
            s1 = jnp.where(jnp.isfinite(xs), xs, 0.0)

        elif rtype == LINEARFIT:
            # rejection_float.c:259-300 — fit y = b + a·i over the sorted
            # kept values (i = rank among kept), σ = mean |residual|;
            # m_x / m_dx2 stay the FULL-size constants
            # (median_and_mean.c:1491-1499 quirk)
            m_x = (n_full - 1) * 0.5
            m_dx2_run = 0.0
            for j in range(n_full):
                dx_ = j - m_x
                m_dx2_run += (dx_ * dx_ - m_dx2_run) / (j + 1)
            inv_mdx2 = float(1.0 / m_dx2_run) if m_dx2_run else 0.0

            rows = lax.broadcasted_iota(jnp.int32, xs_ref.shape, 0)
            aux_ref[:] = (rows < nvalid).astype(jnp.int32)
            st_ref[_R:_R + 1] = zero
            st_ref[_RL:_RL + 1] = zero
            st_ref[_RH:_RH + 1] = zero
            st_ref[_FIRST:_FIRST + 1] = jnp.where(nvalid > 1, 1, 0)

            def body(it):
                keep = aux_ref[:] > 0
                kf = keep.astype(jnp.float32)
                pos = _cumsum0(kf, npad) - 1.0
                nk = kf.sum(axis=0, keepdims=True)
                nks = jnp.maximum(nk, 1.0)
                m_y = jnp.where(keep, xs, 0.0).sum(
                    axis=0, keepdims=True) / nks
                dx = pos - m_x
                dy = xs - m_y
                m_dxdy = jnp.where(keep, dx * dy, 0.0).sum(
                    axis=0, keepdims=True) / nks
                a = m_dxdy * inv_mdx2
                b = m_y - m_x * a
                resid = xs - (a * pos + b)
                sigma = jnp.where(keep, jnp.abs(resid), 0.0).sum(
                    axis=0, keepdims=True) / nks
                active = st_ref[_FIRST:_FIRST + 1] > 0
                low_cand = keep & ((-resid) > sigma * siglow)
                high_cand = keep & (resid > sigma * sighigh)
                cand = low_cand | high_cand
                r_ = st_ref[_R:_R + 1]
                max_acc = jnp.maximum(nk.astype(jnp.int32) - r_ - 4, 0)
                rank = _cumsum0(cand.astype(jnp.float32), npad)
                accept = cand & (rank <= max_acc.astype(jnp.float32)) & \
                    active
                n_low = (accept & low_cand).sum(
                    axis=0, keepdims=True).astype(jnp.int32)
                n_high = (accept & high_cand).sum(
                    axis=0, keepdims=True).astype(jnp.int32)
                aux_ref[:] = (keep & ~accept).astype(jnp.int32)
                n_new = nk.astype(jnp.int32) - n_low - n_high
                changed = (n_low + n_high) > 0
                st_ref[_R:_R + 1] = r_ + n_low + n_high
                st_ref[_RL:_RL + 1] = st_ref[_RL:_RL + 1] + n_low
                st_ref[_RH:_RH + 1] = st_ref[_RH:_RH + 1] + n_high
                st_ref[_FIRST:_FIRST + 1] = jnp.where(
                    active & changed & (n_new > 3), 1, 0)
                return it + 1, changed.any()

            lax.while_loop(lambda c: c[1], lambda c: body(c[0]),
                           (jnp.int32(0), jnp.array(True)))
            rejl = st_ref[_RL:_RL + 1]
            rejh = st_ref[_RH:_RH + 1]
            lo, hi = None, None                  # mask-based keep

        elif rtype == GESDT:
            # rejection_float.c:302-345 + confirm_outliers
            # (median_and_mean.c:685-701).  confirm_outliers accepts a
            # PREFIX of walk steps (0..max(last_flag, 1)), so two passes
            # suffice: pass 1 finds the last flagged step, pass 2 replays
            # the identical walk marking rejections for confirmed steps.
            M = max(int(max_outliers), 1)
            rows = lax.broadcasted_iota(jnp.int32, xs_ref.shape, 0)
            removed = jnp.full_like(nvalid, n_full) - nvalid
            budget_ok = removed < max_outliers
            crit_bc = jnp.broadcast_to(
                crit_ref[:].astype(jnp.float32), (M, xs.shape[1]))
            crit_rows = lax.broadcasted_iota(jnp.int32, crit_bc.shape, 0)

            def walk_step(j, lo_, hi_):
                size = hi_ - lo_
                mean_w, sd = _window_mean_sd(s1, s2, lo_, hi_)
                first = _select_at(xs, lo_)
                last = _select_at(xs, jnp.maximum(hi_ - 1, 0))
                dev_low = mean_w - first
                dev_high = last - mean_w
                take_high = dev_high > dev_low      # strict >
                maxdev = jnp.where(take_high, dev_high, dev_low)
                g = maxdev / jnp.maximum(sd, 1e-30)
                valid_step = (j < (max_outliers - removed)) & (size > 1)
                new_lo = jnp.where(valid_step,
                                   jnp.where(take_high, lo_, lo_ + 1), lo_)
                new_hi = jnp.where(valid_step,
                                   jnp.where(take_high, hi_ - 1, hi_), hi_)
                return (size, g, take_high, first, last, valid_step,
                        new_lo, new_hi)

            st_ref[_LO:_LO + 1] = lo0
            st_ref[_HI:_HI + 1] = hi0
            st_ref[_LF:_LF + 1] = jnp.full_like(lo0, -1)

            def pass1(j, carry):
                lo_ = st_ref[_LO:_LO + 1]
                hi_ = st_ref[_HI:_HI + 1]
                size, g, take_high, _, _, valid_step, new_lo, new_hi = \
                    walk_step(j, lo_, hi_)
                idx_c = jnp.minimum(removed + j, M - 1)
                crit_j = jnp.where(crit_rows == idx_c, crit_bc, 0.0).sum(
                    axis=0, keepdims=True)
                flagged = (g > crit_j) & (size > 2) & valid_step
                st_ref[_LF:_LF + 1] = jnp.where(
                    flagged, j, st_ref[_LF:_LF + 1])
                st_ref[_LO:_LO + 1] = new_lo
                st_ref[_HI:_HI + 1] = new_hi
                return carry

            lax.fori_loop(0, M, pass1, 0)
            i_conf = jnp.maximum(st_ref[_LF:_LF + 1],
                                 jnp.minimum(1, M - 1))

            aux_ref[:] = (rows < nvalid).astype(jnp.int32)
            st_ref[_LO:_LO + 1] = lo0
            st_ref[_HI:_HI + 1] = hi0
            st_ref[_RL:_RL + 1] = zero
            st_ref[_RH:_RH + 1] = zero

            def pass2(j, carry):
                lo_ = st_ref[_LO:_LO + 1]
                hi_ = st_ref[_HI:_HI + 1]
                size, _, take_high, first, last, valid_step, new_lo, \
                    new_hi = walk_step(j, lo_, hi_)
                conf = (j <= i_conf) & valid_step & budget_ok
                x_rm = jnp.where(take_high, last, first)
                # low removals reject the true sorted index (lo); high
                # removals the recorded SHRUNK-array index size−1
                # (rejection_float.c:332 quirk)
                rec = jnp.where(take_high, size - 1, lo_)
                is_high_val = x_rm >= median0
                st_ref[_RL:_RL + 1] = st_ref[_RL:_RL + 1] + \
                    (conf & ~is_high_val).astype(jnp.int32)
                st_ref[_RH:_RH + 1] = st_ref[_RH:_RH + 1] + \
                    (conf & is_high_val).astype(jnp.int32)
                aux_ref[:] = jnp.where((rows == rec) & conf, 0, aux_ref[:])
                st_ref[_LO:_LO + 1] = new_lo
                st_ref[_HI:_HI + 1] = new_hi
                return carry

            lax.fori_loop(0, M, pass2, 0)
            rejl = st_ref[_RL:_RL + 1]
            rejh = st_ref[_RH:_RH + 1]
            lo, hi = None, None                  # mask-based keep
        else:  # pragma: no cover
            raise ValueError(f"pallas kernel does not support rtype {rtype}")

        rows = lax.broadcasted_iota(jnp.int32, xs.shape, 0)
        # trivial guard: kept<=1 before rejection → keep as-is
        trivial = nvalid <= 1
        if lo is None:
            # int32 select: a select between two i1 vectors hits a Mosaic
            # legalization gap (trunci i8→i1), so blend as integers
            keep = jnp.where(trivial,
                             (rows < nvalid).astype(jnp.int32),
                             aux_ref[:]) > 0
        else:
            lo = jnp.where(trivial, 0, lo)
            hi = jnp.where(trivial, nvalid, hi)
            keep = (rows >= lo) & (rows < hi)
            if rtype in (SIGMA, MAD, WINSORIZED):
                # ∪ the guard-truncated kept-top segment (ascending C
                # scan keeps the LARGEST high candidates once N−r≤4)
                seg_lo = st_ref[_SL:_SL + 1]
                seg_hi = jnp.where(trivial, 0, st_ref[_SH:_SH + 1])
                keep = keep | ((rows >= seg_lo) & (rows < seg_hi))
        rejl = jnp.where(trivial, 0, rejl)
        rejh = jnp.where(trivial, 0, rejh)
        nkept = keep.sum(axis=0, keepdims=True).astype(jnp.float32)
        sum_kept = jnp.where(keep, s1, 0.0).sum(axis=0, keepdims=True)
        mean = sum_kept / jnp.maximum(nkept, 1.0)

        # kept==0 → median of the original (zeros included) stack, computed
        # analytically by merging (N − nvalid) zeros into the sorted window
        x = x_ref[:]
        n_neg = (jnp.where(valid, x, _INF) < 0.0).sum(
            axis=0, keepdims=True).astype(jnp.int32)
        nzeros = n - nvalid

        def merged_at(k):
            idx = jnp.where(k < n_neg, k, k - nzeros)
            idx = jnp.clip(idx, 0, n - 1)
            v = _select_at(xs, idx)
            in_zero_run = (k >= n_neg) & (k < n_neg + nzeros)
            return jnp.where(in_zero_run, 0.0, v)

        k0 = jnp.full((1, T), (n - 1) // 2, jnp.int32)
        k1 = jnp.full((1, T), n // 2, jnp.int32)
        med_all = 0.5 * (merged_at(k0) + merged_at(k1))
        mean = jnp.where(nkept > 0, mean, med_all)

        if with_weights:
            # pmin/pmax membership rule (median_and_mean.c:1041-1095)
            w = w_ref[:].astype(jnp.float32)
            pmin = jnp.min(jnp.where(keep, xs, _INF), axis=0, keepdims=True)
            pmax = jnp.max(jnp.where(keep, xs, -_INF), axis=0, keepdims=True)
            inrange = (x >= pmin) & (x <= pmax) & (x != 0.0)
            wsum = jnp.where(inrange, x * w, 0.0).sum(axis=0, keepdims=True)
            wnorm = jnp.where(inrange, w, 0.0).sum(axis=0, keepdims=True)
            fallback = jnp.where(inrange & (x > 0), x, 0.0).sum(
                axis=0, keepdims=True) / jnp.maximum(nkept, 1.0)
            wmean = jnp.where((wnorm != 0.0) & (wsum != 0.0),
                              wsum / wnorm, fallback)
            mean = jnp.where(nkept > 0, wmean, med_all)

        mean_ref[:] = mean
        rejl_ref[:] = rejl
        rejh_ref[:] = rejh

    return kernel


def _pick_tile(n: int, dtype) -> int:
    """Pixel-tile width: keep ~7 live (N, TILE) f32 planes under ~8 MB of
    VMEM, lane-aligned.  SIRIL_TPU_PALLAS_TILE overrides (perf tuning)."""
    env = os.environ.get("SIRIL_TPU_PALLAS_TILE")
    if env:
        return max(512, (int(env) // 512) * 512)
    budget = 8 * 1024 * 1024
    per_col = max(n, 8) * 4 * 7
    t = budget // per_col
    t = max(512, min(4096, (t // 512) * 512))
    return t


def _interpret() -> bool:
    if os.environ.get("SIRIL_TPU_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("rtype", "mode", "siglow", "sighigh", "with_weights",
                     "n_full", "max_outliers"))
def pallas_reject_mean(stack, scale, offset, mul, weights=None,
                       critical=None, *,
                       rtype: int, mode: int, siglow: float, sighigh: float,
                       with_weights: bool = False, n_full: int = 0,
                       max_outliers: int = 0):
    """Fused normalize+reject+mean over an (N, P) stack.

    ``stack``: (N, P) int16 (raw FITS, BZERO 32768) or float32 in [0,1].
    ``scale``/``offset``/``mul``: (N,) float32 per-frame normalization.
    ``critical``: (max_outliers,) float32 GESDT λ table (GESDT only).
    Returns (mean, rej_low, rej_high), each (P,).
    """
    n, p = stack.shape
    npad = _next_pow2(max(n, 2))
    tile = _pick_tile(npad, stack.dtype)
    g = -(-p // tile)
    p_pad = g * tile
    if p_pad != p:
        stack = jnp.pad(stack, ((0, 0), (0, p_pad - p)))
        if weights is not None:
            weights = jnp.pad(weights, ((0, 0), (0, p_pad - p)))
    if weights is None:
        weights = jnp.ones((1, 1), jnp.float32)   # placeholder operand
        w_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
    else:
        w_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    n_crit = max(int(max_outliers), 1) if rtype == GESDT else 1
    if critical is None or rtype != GESDT:
        critical = jnp.zeros(n_crit, jnp.float32)
    critical = jnp.asarray(critical, jnp.float32)[:n_crit].reshape(n_crit, 1)
    crit_spec = pl.BlockSpec((n_crit, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    kernel = _build_kernel(rtype, mode, siglow, sighigh, n, npad,
                           with_weights, stack.dtype, n_full, max_outliers)
    coef_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    mean, rejl, rejh = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            coef_spec, coef_spec, coef_spec, w_spec, crit_spec,
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, p_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, p_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((npad, tile), jnp.float32),   # xs (sorted)
            pltpu.VMEM((n, tile), jnp.float32),      # normalized x
            pltpu.VMEM((8, tile), jnp.int32),        # int loop state
            pltpu.VMEM((8, tile), jnp.float32),      # float loop state
            pltpu.VMEM((npad, tile), jnp.int32),     # keep mask (aux)
            pltpu.VMEM((npad, tile), jnp.float32),   # winsor accum w
        ],
        interpret=_interpret(),
    )(stack, scale.reshape(n, 1), offset.reshape(n, 1), mul.reshape(n, 1),
      weights, critical)
    return mean[0, :p], rejl[0, :p], rejh[0, :p]


def pallas_available(rtype: int, mode: int) -> bool:
    """True when the fused Pallas path covers this stack configuration."""
    if os.environ.get("SIRIL_TPU_NO_PALLAS"):
        return False
    return rtype in PALLAS_RTYPES
