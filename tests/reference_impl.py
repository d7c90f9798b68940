"""Scalar numpy re-implementations of the reference's per-pixel rejection
loops (rejection_float.c), used as oracles for the vectorized JAX kernels.

These follow the C control flow exactly (cumulative r-guard, iteration
structure, float32 arithmetic where it matters) so the JAX kernels can be
tested on random stacks, not just the golden vectors.
"""

from __future__ import annotations

import numpy as np


def sd(x):
    x = np.asarray(x, np.float32)
    n = x.size
    if n < 2:
        return 0.0
    mean = np.float32(x.astype(np.float64).sum() / n)
    vsum = ((x - mean).astype(np.float64) ** 2).sum()
    return float(np.sqrt(np.float32(vsum / (n - 1))))


def median(x):
    x = np.sort(np.asarray(x, np.float32))
    n = x.size
    if n == 0:
        return 0.0
    if n % 2:
        return float(x[n // 2])
    return float(0.5 * (x[n // 2 - 1] + x[n // 2]))


def mad(x, med):
    return median(np.abs(np.asarray(x, np.float32) - np.float32(med)))


def reject_pixel(stack, rtype, siglow, sighigh, n_full=None,
                 critical=None, max_outliers=0):
    """Returns (kept_values_sorted, rej_low, rej_high, mean).

    Mirrors apply_rejection_float + the unweighted mean_and_reject path.
    """
    stack = np.asarray(stack, np.float32)
    n_frames = stack.size
    rej = [0, 0]
    work = stack[stack != 0.0]
    kept0 = work.size
    if kept0 <= 1:
        vals = work
        mean = _final_mean(vals, stack)
        return vals, 0, 0, mean
    removed = n_frames - kept0
    x = np.sort(work)          # canonical ascending order
    N = x.size
    r = 0

    if rtype == "percentile":
        med = median(x)
        if med == 0.0:
            return np.zeros(0, np.float32), 0, 0, _final_mean(np.zeros(0), stack)
        keep = []
        for v in x:
            if med - v > med * siglow:
                rej[0] += 1
            elif v - med > med * sighigh:
                rej[1] += 1
            else:
                keep.append(v)
        x = np.asarray(keep, np.float32)

    elif rtype in ("sigma", "mad"):
        med = median(x)
        if med == 0.0:
            return np.zeros(0, np.float32), 0, 0, _final_mean(np.zeros(0), stack)
        first = True
        while True:
            var = sd(x) if rtype == "sigma" else mad(x, med)
            if not first:
                med = median(x)
            first = False
            keep = []
            for v in x:
                if x.size - r <= 4:
                    keep.append(v)
                elif med - v > var * siglow:
                    rej[0] += 1
                    r += 1
                elif v - med > var * sighigh:
                    rej[1] += 1
                    r += 1
                else:
                    keep.append(v)
            changed = len(keep) != x.size
            x = np.asarray(keep, np.float32)
            if not (changed and x.size > 3):
                break

    elif rtype == "sigmedian":
        while True:
            sigma = sd(x)
            med = np.float32(median(x))
            nrep = 0
            for i, v in enumerate(x):
                if med - v > sigma * siglow:
                    rej[0] += 1
                    x[i] = med
                    nrep += 1
                elif v - med > sigma * sighigh:
                    rej[1] += 1
                    x[i] = med
                    nrep += 1
            if nrep == 0:
                break

    elif rtype == "winsorized":
        while True:
            sigma = np.float32(sd(x))
            med = np.float32(median(x))
            w = x.copy()
            while True:
                m0 = med - np.float32(1.5) * sigma
                m1 = med + np.float32(1.5) * sigma
                w = np.clip(w, m0, m1)
                sigma0 = sigma
                sigma = np.float32(1.134) * np.float32(sd(w))
                if abs(sigma - sigma0) <= sigma0 * np.float32(0.0005):
                    break
            keep = []
            for v in x:
                if x.size - r <= 4:
                    keep.append(v)
                elif med - v > sigma * siglow:
                    rej[0] += 1
                    r += 1
                elif v - med > sigma * sighigh:
                    rej[1] += 1
                    r += 1
                else:
                    keep.append(v)
            changed = len(keep) != x.size
            x = np.asarray(keep, np.float32)
            if not (changed and x.size > 3):
                break

    elif rtype == "linearfit":
        nf = n_full or n_frames
        m_x = np.float32((nf - 1) * 0.5)
        m_dx2 = 0.0
        for j in range(nf):
            dx = j - m_x
            m_dx2 += (dx * dx - m_dx2) / (j + 1)
        inv_mdx2 = np.float32(1.0 / m_dx2)
        while True:
            x = np.sort(x)
            Nc = x.size
            m_y = np.float64(0.0)
            for i in range(Nc):
                m_y += (x[i] - m_y) / (i + 1)
            m_dxdy = np.float64(0.0)
            for i in range(Nc):
                dx = i - m_x
                m_dxdy += (dx * (x[i] - m_y) - m_dxdy) / (i + 1)
            a = np.float32(m_dxdy * inv_mdx2)
            b = np.float32(m_y - m_x * a)
            sigma = np.float32(np.mean(np.abs(x - (a * np.arange(Nc) + b))))
            keep = []
            for i, v in enumerate(x):
                if Nc - r <= 4:
                    keep.append(v)
                elif a * i + b - v > sigma * siglow:
                    rej[0] += 1
                    r += 1
                elif v - (a * i + b) > sigma * sighigh:
                    rej[1] += 1
                    r += 1
                else:
                    keep.append(v)
            changed = len(keep) != Nc
            x = np.asarray(keep, np.float32)
            if not (changed and x.size > 3):
                break

    elif rtype == "gesdt":
        med = median(x)
        if removed >= max_outliers:
            return x, 0, 0, _final_mean(x, stack)
        mo = max_outliers - removed
        w = x.copy()
        outs = []
        cold = 0
        size = w.size
        for it in range(mo):
            if size < 2:
                outs.append((False, 0.0, 0, False))
                continue
            s = sd(w[:size])
            avg = np.float32(w[:size].astype(np.float64).mean())
            dev_low = avg - w[0]
            dev_high = w[size - 1] - avg
            if dev_high > dev_low:
                maxdev, max_index = dev_high, size - 1
            else:
                maxdev, max_index = dev_low, 0
            g = maxdev / s if s > 0 else 0.0
            flag = g > critical[it + removed]
            xv = w[max_index]
            if max_index == 0:
                idx = cold
                cold += 1
            else:
                idx = max_index
            outs.append((flag, xv, idx, max_index != 0))
            w = np.delete(w, max_index)
            size -= 1
        # confirm_outliers
        rejected = np.zeros(x.size, int)
        i = len(outs) - 1
        while i > 1 and not outs[i][0]:
            i -= 1
        for j in range(i, -1, -1):
            flag, xv, idx, _ = outs[j]
            if xv >= med:
                rejected[idx] = 1
                rej[1] += 1
            else:
                rejected[idx] = -1
                rej[0] += 1
        x = x[rejected == 0]

    elif rtype == "none":
        pass
    else:
        raise ValueError(rtype)

    return x, rej[0], rej[1], _final_mean(x, stack)


def _final_mean(kept, orig_stack):
    if kept.size == 0:
        return median(orig_stack)
    return float(np.float64(kept.astype(np.float64).sum()) / kept.size)
