"""Survey-scale sharded stacking — BASELINE config 5 (plate solve +
photometric color calibration + rejection stack, 1000×61 MP, sharded
across a TPU slice).

TPU-native design (SURVEY §2.9 mapping, §5 long-sequence scaling):

- **Frames are the STREAMED axis.**  1000×61 MP f32 is ~244 GB — far
  beyond any slice's HBM — so, exactly like the reference's row-block
  engine (``stack_compute_parallel_blocks`` /
  ``stack_get_max_number_of_rows``, median_and_mean.c:1234-1259), the
  stack is processed in row blocks: the host reads rows [y0, y1) of ALL
  N frames, ships ONE (N, rows·W) block to the mesh, and the fused
  normalize+reject+mean kernel consumes it.  The block height comes from
  the per-device HBM budget (``plan_survey_rows``).
- **Pixels are the SHARDED axis.**  Each device owns a slice of the
  block's pixel columns and holds ALL N frame values for its pixels, so
  rejection sorts/medians never cross chips.  The pixel axis is sharded
  with ``NamedSharding(mesh, P(None, "pix"))``; uneven tails (P not a
  multiple of the device count) are handled by GSPMD's implicit padding
  and checked by tests/test_survey_sharded.py.
- **Per-frame estimators stream frame-by-frame** (pass 1): each frame is
  uploaded pixel-sharded, the IKSS/lite estimators reduce over the pixel
  axis (XLA inserts psum over ``pix``), and only the (L, N) coefficient
  table stays on host.  This is ``do_normalization``
  (normalization.c:46) restructured so no more than ONE frame is
  resident during estimation.
- **Multi-host note**: on a multi-host slice the per-block host reads
  shard naturally by process — each host reads only the pixel columns
  its addressable devices own (``jax.make_array_from_process_local_data``)
  and the (N, rows·W) global block never materializes on one host; DCN
  carries nothing but the tiny coefficient all_gathers.  This process
  runs single-host, so the code uses plain ``jax.device_put`` with the
  same shardings (identical compiled collectives).

Plate solve + PCC then run on the STACKED image (the reference's config-5
workflow: solve/color-calibrate the result, astrometry_solver.c:881 +
photometric_cc.c:811): single 61 MP image, trivially HBM-resident.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from siril_tpu.utils.log import log_message


def plan_survey_rows(n_frames: int, width: int, n_devices: int,
                     budget_bytes_per_dev: Optional[int] = None) -> int:
    """Rows per streamed block: the block slice on ONE device is
    (N, rows·W/ndev)·4 B plus ~3× sort/loop scratch — keep it under the
    per-device budget (stack_get_max_number_of_rows equivalent)."""
    if budget_bytes_per_dev is None:
        from siril_tpu.utils.devmem import memory_budget_bytes

        budget_bytes_per_dev = memory_budget_bytes() // 2
    per_row_per_dev = n_frames * width * 4 * 4 // max(n_devices, 1)
    rows = max(int(budget_bytes_per_dev // max(per_row_per_dev, 1)), 8)
    return rows


def _sharded_block_kernel(mesh: Mesh, rtype: int, mode: int, siglow: float,
                          sighigh: float, n: int, max_outliers: int = 0):
    """Fused normalize+reject+mean jit with explicit mesh shardings —
    the multi-chip twin of ops.stacking.make_block_kernel."""
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.stacking import _norm_apply

    pix_sh = NamedSharding(mesh, P(None, "pix"))
    out_sh = NamedSharding(mesh, P("pix"))

    def blk(stack, scale, offset, mul, critical):
        normed = _norm_apply(stack, scale, offset, mul, mode)
        mean, rl, rh = rj.rejection_mean(
            normed, rtype, siglow, sighigh, critical=critical,
            n_full=n, max_outliers=max_outliers)
        return mean, rl.sum(), rh.sum()

    return jax.jit(blk, in_shardings=(pix_sh, None, None, None, None),
                   out_shardings=(out_sh, None, None)), pix_sh


def _estimator_pass(read_frame: Callable[[int, int], np.ndarray],
                    n: int, L: int, mesh: Mesh, lite: bool):
    """Pass 1: per-frame location/scale estimators, one frame resident at
    a time, pixel-sharded reductions."""
    from siril_tpu.ops.statistics import norm_estimators_hist_jax

    pix_sh = NamedSharding(mesh, P(None, "pix"))

    @jax.jit
    def est(flat):
        flat = jax.lax.with_sharding_constraint(flat, pix_sh)
        e = norm_estimators_hist_jax(flat, lite=lite)
        return jnp.stack([e["location"], e["scale"]])

    ndev = int(np.prod(list(mesh.shape.values())))
    loc = np.zeros((L, n), np.float32)
    sca = np.zeros((L, n), np.float32)
    for k in range(n):
        for c in range(L):
            flat = read_frame(k, c).reshape(1, -1)
            flat = _pad_pix(flat, ndev)
            out = np.asarray(est(jax.device_put(flat, pix_sh)))
            loc[c, k] = out[0, 0]
            sca[c, k] = out[1, 0]
    return loc, sca


def _pad_pix(buf: np.ndarray, ndev: int) -> np.ndarray:
    """Pad the pixel axis to a device-count multiple with zeros (zero
    pixels are 'invalid' to both estimators and rejection, so padding is
    semantics-free; device_put requires divisible shards)."""
    p = buf.shape[1]
    rem = p % ndev
    if rem == 0:
        return buf
    return np.pad(buf, ((0, 0), (0, ndev - rem)))


def coeffs_from_estimators(loc: np.ndarray, sca: np.ndarray, mode: int,
                           ref_pos: int, equalize_rgb: bool = False):
    """compute_factors_from_estimators semantics (normalization.c:146) —
    delegates to the single implementation in ops/normalization.py so
    the sharded path cannot drift from the single-device stack path."""
    from siril_tpu.ops.normalization import factors_from_estimators

    offset, scale, mul = factors_from_estimators(
        loc, sca, mode, ref_pos, equalize_rgb=equalize_rgb)
    return (offset.astype(np.float32), scale.astype(np.float32),
            mul.astype(np.float32))


@dataclass
class SurveyStackResult:
    data: np.ndarray                    # (L, H, W) f32
    total_rejected: Tuple[int, int]
    elapsed_s: float
    rows_per_block: int
    n_blocks: int


def survey_stack_sharded(read_rows: Callable[[int, int, int, int],
                                             np.ndarray],
                         n: int, L: int, H: int, W: int, mesh: Mesh,
                         rtype: int, mode: int,
                         siglow: float = 3.0, sighigh: float = 3.0,
                         ref_pos: int = 0,
                         budget_bytes_per_dev: Optional[int] = None,
                         prefetch: bool = True) -> SurveyStackResult:
    """Streamed, pixel-sharded rejection stack.

    ``read_rows(frame, chan, y0, y1) -> (y1-y0, W) f32`` is the host-side
    streaming reader (the seq_opened_read_region equivalent — a memmapped
    FITS partial read, or a synthetic generator in tests).
    """
    from siril_tpu.ops import rejection as rj

    t0 = time.perf_counter()
    ndev = int(np.prod(list(mesh.shape.values())))
    rows = plan_survey_rows(n, W, ndev, budget_bytes_per_dev)
    rows = min(rows, H)

    max_outliers = 0
    critical = np.zeros(1, np.float32)
    if rtype == rj.GESDT:
        max_outliers = int(np.floor(n * siglow))
        critical = rj.gesdt_critical_values(n, sighigh, max_outliers)

    def read_frame_flat(k, c):
        return np.concatenate(
            [read_rows(k, c, y0, min(y0 + rows, H), ).reshape(-1)
             for y0 in range(0, H, rows)])

    loc, sca = _estimator_pass(read_frame_flat, n, L, mesh, lite=True)
    offset, scale, mul = coeffs_from_estimators(loc, sca, mode, ref_pos)

    kernel, pix_sh = _sharded_block_kernel(mesh, rtype, mode, siglow,
                                           sighigh, n, max_outliers)
    out = np.zeros((L, H, W), np.float32)
    tot = [0, 0]
    blocks = [(c, y0, min(y0 + rows, H))
              for c in range(L) for y0 in range(0, H, rows)]

    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(max_workers=4)

    def assemble(block):
        c, y0, y1 = block
        buf = np.empty((n, (y1 - y0) * W), np.float32)
        for k in range(n):
            buf[k] = read_rows(k, c, y0, y1).reshape(-1)
        return jax.device_put(_pad_pix(buf, ndev), pix_sh)

    fut = pool.submit(assemble, blocks[0]) if prefetch else None
    for bi, block in enumerate(blocks):
        c, y0, y1 = block
        dev = fut.result() if prefetch else assemble(block)
        if prefetch and bi + 1 < len(blocks):
            fut = pool.submit(assemble, blocks[bi + 1])
        mean, rl, rh = kernel(dev, jnp.asarray(scale[c]),
                              jnp.asarray(offset[c]), jnp.asarray(mul[c]),
                              jnp.asarray(critical))
        out[c, y0:y1] = np.asarray(mean)[: (y1 - y0) * W].reshape(
            y1 - y0, W)
        tot[0] += int(rl)
        tot[1] += int(rh)
    pool.shutdown(wait=False)
    res = SurveyStackResult(out, (tot[0], tot[1]),
                            time.perf_counter() - t0, rows, len(blocks))
    log_message(f"survey stack: {n}×{L}×{H}×{W} in {res.elapsed_s:.1f}s "
                f"({len(blocks)} blocks of {rows} rows, {ndev} devices)")
    return res


def survey_platesolve_pcc_stack(read_rows, n: int, L: int, H: int, W: int,
                                mesh: Mesh, catalog, solve_args,
                                rtype: Optional[int] = None,
                                mode: Optional[int] = None,
                                siglow: float = 3.0, sighigh: float = 3.0,
                                budget_bytes_per_dev: Optional[int] = None):
    """Config-5 chain: streamed sharded rejection stack → plate solve the
    result → photometric color calibration against the catalogue.

    Returns (SirilImage with WCS, white-balance coeffs, SurveyStackResult).
    """
    from siril_tpu.astrometry.pcc import photometric_color_calibration
    from siril_tpu.astrometry.solver import solve_image
    from siril_tpu.core.image import SirilImage
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import ADDITIVE_SCALING

    rtype = rj.WINSORIZED if rtype is None else rtype
    mode = ADDITIVE_SCALING if mode is None else mode
    sres = survey_stack_sharded(read_rows, n, L, H, W, mesh, rtype, mode,
                                siglow, sighigh,
                                budget_bytes_per_dev=budget_bytes_per_dev)
    img = SirilImage(data=np.clip(sres.data, 0.0, 1.0))
    solve = solve_image(img, catalog, solve_args)
    img.wcs = solve.wcs
    if L == 3:
        pcc_img = photometric_color_calibration(img, catalog)
        if pcc_img is not None:
            img = pcc_img
    return img, solve, sres
