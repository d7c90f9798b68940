"""End-to-end stacking tests — the config-1 integration gate
(BASELINE.md: sigma-clipped average of pre-registered mono lights), with
output verified against per-pixel oracles (compare_fits-style f32
tolerance)."""

import numpy as np
import pytest

from siril_tpu.core.image import FLOAT_IMG, SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.io.fits_io import write_fits
from siril_tpu.ops import rejection as rj
from siril_tpu.ops import stacking as stk
from siril_tpu.ops.normalization import ADDITIVE_SCALING, NO_NORM
from tests import reference_impl as ref


def make_sequence(tmp_path, rng, n=12, h=48, w=64, outliers=True,
                  offsets=None):
    """Synthetic light frames: fixed scene + noise + optional outliers."""
    scene = (0.2 + 0.6 * rng.random((h, w))).astype(np.float32)
    files = []
    frames = []
    for i in range(n):
        f = scene + rng.normal(0, 0.01, (h, w)).astype(np.float32)
        if offsets is not None:
            f = f + offsets[i]
        if outliers and i % 3 == 0:
            ys, xs = rng.integers(0, h, 5), rng.integers(0, w, 5)
            f[ys, xs] += 0.3
        f = np.clip(f, 1e-4, 1.0).astype(np.float32)
        frames.append(f)
        img = SirilImage(data=f[None])
        img.keywords.exposure = 60.0
        p = tmp_path / f"light_{i:05d}.fit"
        write_fits(img, p, bitdepth=FLOAT_IMG)
        files.append(str(p))
    seq = Sequence.from_files(files, name="light_")
    return seq, np.stack(frames)


class TestSigmaStack:
    def test_matches_oracle(self, tmp_path, rng):
        seq, frames = make_sequence(tmp_path, rng)
        args = stk.StackArgs(method="rej", rejection=rj.SIGMA,
                             siglow=3.0, sighigh=3.0, normalize=NO_NORM)
        res = stk.stack_sequence(seq, args)
        out = res.image.host()[0]
        n, h, w = frames.shape
        # oracle on a sample of pixels
        for (y, x) in [(0, 0), (10, 20), (47, 63), (25, 30), (5, 60)]:
            _, _, _, m = ref.reject_pixel(frames[:, y, x], "sigma", 3.0, 3.0)
            assert np.isclose(out[y, x], np.clip(m, 0, 1), rtol=2e-5), (y, x)
        assert res.total_rejected[1] > 0     # outliers were rejected

    def test_small_blocks_same_result(self, tmp_path, rng):
        seq, frames = make_sequence(tmp_path, rng, n=8)
        a1 = stk.StackArgs(method="rej", rejection=rj.SIGMA, block_mb=512)
        r1 = stk.stack_sequence(seq, a1)
        seq2 = Sequence.from_files(seq._file_list, name="light_")
        a2 = stk.StackArgs(method="rej", rejection=rj.SIGMA, block_mb=1)
        r2 = stk.stack_sequence(seq2, a2)
        np.testing.assert_array_equal(r1.image.host(), r2.image.host())


class TestNormalizedStack:
    def test_additive_scaling_removes_offsets(self, tmp_path, rng):
        # frames with varying sky offsets → normalization should align them
        offs = np.linspace(0.0, 0.1, 10)
        seq, frames = make_sequence(tmp_path, rng, n=10, outliers=False,
                                    offsets=offs)
        args = stk.StackArgs(method="rej", rejection=rj.WINSORIZED,
                             normalize=ADDITIVE_SCALING)
        res = stk.stack_sequence(seq, args)
        out = res.image.host()[0]
        # compare vs the no-offset mean scene: normalized stack should be
        # much closer to frame 0 (the reference) than the raw mean is
        raw_mean = frames.mean(axis=0)
        err_norm = np.abs(out - frames[0]).mean()
        err_raw = np.abs(raw_mean - frames[0]).mean()
        assert err_norm < err_raw * 0.5

    def test_rejmaps(self, tmp_path, rng):
        seq, _ = make_sequence(tmp_path, rng, n=9)
        args = stk.StackArgs(method="rej", rejection=rj.SIGMA,
                             create_rejmaps=True)
        res = stk.stack_sequence(seq, args)
        assert res.rejmap_low is not None and res.rejmap_high is not None
        assert (res.rejmap_high.host() > 0).any()


class TestOtherMethods:
    def test_median(self, tmp_path, rng):
        seq, frames = make_sequence(tmp_path, rng, n=7, outliers=False)
        res = stk.stack_sequence(seq, stk.StackArgs(method="med"))
        np.testing.assert_allclose(res.image.host()[0],
                                   np.median(frames, axis=0), atol=1e-6)

    def test_sum(self, tmp_path, rng):
        seq, frames = make_sequence(tmp_path, rng, n=5, outliers=False)
        res = stk.stack_sequence(seq, stk.StackArgs(method="sum"))
        s = frames.sum(axis=0)
        np.testing.assert_allclose(res.image.host()[0], s / s.max(), rtol=1e-5)

    def test_minmax(self, tmp_path, rng):
        seq, frames = make_sequence(tmp_path, rng, n=5, outliers=False)
        rmin = stk.stack_sequence(seq, stk.StackArgs(method="min"))
        np.testing.assert_allclose(rmin.image.host()[0], frames.min(axis=0),
                                   atol=1e-7)
        seq2 = Sequence.from_files(seq._file_list, name="light_")
        rmax = stk.stack_sequence(seq2, stk.StackArgs(method="max"))
        np.testing.assert_allclose(rmax.image.host()[0], frames.max(axis=0),
                                   atol=1e-7)


class TestShiftedStack:
    def test_translation_registration_applied(self, tmp_path, rng):
        seq, frames = make_sequence(tmp_path, rng, n=6, outliers=False)
        # synthetic shift-only registration data
        reg = seq.reg(0)
        shifts = [(0, 0), (2, 1), (-1, 3), (0, -2), (3, 0), (-2, -1)]
        for i, (dx, dy) in enumerate(shifts):
            reg.H[i] = np.eye(3)
            reg.H[i][0, 2] = dx
            reg.H[i][1, 2] = dy
            reg.valid[i] = True
        res = stk.stack_sequence(seq, stk.StackArgs(method="rej",
                                                    rejection=rj.NO_REJEC))
        out = res.image.host()[0]
        # oracle: mean of shifted frames (zeros excluded like rejection path)
        h, w = frames.shape[1:]
        shifted = np.zeros_like(frames)
        for i, (dx, dy) in enumerate(shifts):
            img = stk._shift_into(frames[i][None], dx, dy)[0]
            shifted[i] = img
        cnt = (shifted != 0).sum(axis=0)
        mean = shifted.sum(axis=0) / np.maximum(cnt, 1)
        interior = np.s_[5:-5, 5:-5]
        np.testing.assert_allclose(out[interior], mean[interior], rtol=1e-5)

    def test_metadata_accumulation(self, tmp_path, rng):
        seq, _ = make_sequence(tmp_path, rng, n=4, outliers=False)
        res = stk.stack_sequence(seq, stk.StackArgs(method="rej"))
        assert res.image.keywords.stackcnt == 4
        assert res.image.keywords.livetime == pytest.approx(240.0)


# ---------------------------------------------------------------------------
# overlap normalization (mosaics) — normalization.c:296-925
# ---------------------------------------------------------------------------


def test_overlap_normalization_recovers_offsets(tmp_path):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.normalization import (
        ADDITIVE,
        ADDITIVE_SCALING,
        compute_overlap,
        compute_overlap_normalization,
    )

    rng = np.random.default_rng(21)
    scene = (0.2 + 0.3 * rng.random((160, 160))).astype(np.float32)
    crops = [(0, 0), (40, 0), (0, 40)]        # scene-space origins
    offs = [0.0, 0.05, -0.03]                  # injected level differences
    files = []
    for k, ((sx, sy), o) in enumerate(zip(crops, offs)):
        d = scene[sy:sy + 96, sx:sx + 96] + o
        p = str(tmp_path / f"mos_{k + 1:05d}.fit")
        write_fits(SirilImage(data=d[None].astype(np.float32)), p,
                   bitdepth=-32)
        files.append(p)
    seq = Sequence.from_files(files, name="mos_")
    seq.nb_layers = 1
    reg = seq.reg(0)
    for k, (sx, sy) in enumerate(crops):
        reg.H[k] = np.eye(3)
        reg.H[k][0, 2] = sx          # frame → ref translation
        reg.H[k][1, 2] = sy
        reg.valid[k] = True
    seq.reference_image = 0

    ov = compute_overlap(seq, 0, 0, 1)
    assert ov is not None
    (xi, yi, w, h), (xj, yj, w2, h2) = ov
    assert (w, h) == (56, 96) and (xi, xj) == (40, 0)

    co = compute_overlap_normalization(seq, np.arange(3), ADDITIVE)
    # stack kernel applies v − offset: recovered offsets must equal the
    # injected level differences relative to the reference frame
    np.testing.assert_allclose(co.offset[0], [0.0, 0.05, -0.03], atol=2e-3)

    # with scaling mode on identically-scaled frames, scales stay ~1
    co2 = compute_overlap_normalization(seq, np.arange(3), ADDITIVE_SCALING)
    np.testing.assert_allclose(co2.scale[0], 1.0, atol=0.05)
    np.testing.assert_allclose(co2.offset[0], [0.0, 0.05, -0.03], atol=4e-3)


def test_fused_pipeline_step_multichip():
    """Sharded fused step (decode+calibrate+warp+reshard+stack) compiles
    and executes on the virtual 8-device mesh and matches a single-device
    reference computation."""
    import jax
    import jax.numpy as jnp

    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import ADDITIVE_SCALING
    from siril_tpu.parallel.sharding import fused_pipeline_step, make_mesh

    devs = jax.devices()
    if len(devs) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(7)
    N, H, W = 8, 32, 32
    raw = rng.integers(-20000, 20000, (N, H, W)).astype(np.int16)
    Hinvs = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))
    dark = np.zeros((H, W), np.float32)
    flat = np.ones((H, W), np.float32)

    mesh = make_mesh(2, 4, devices=devs[:8])
    step = fused_pipeline_step(mesh, rj.SIGMA, ADDITIVE_SCALING,
                               3.0, 3.0, N, H, W)
    mean, rl, rh = step(jnp.asarray(raw), jnp.asarray(Hinvs),
                        jnp.asarray(dark), jnp.asarray(flat), 0)
    mean = np.asarray(mean)
    # single-device reference: identity warp → decode + sigma stack
    mesh1 = make_mesh(1, 1, devices=devs[:1])
    step1 = fused_pipeline_step(mesh1, rj.SIGMA, ADDITIVE_SCALING,
                                3.0, 3.0, N, H, W)
    mean1 = np.asarray(step1(jnp.asarray(raw), jnp.asarray(Hinvs),
                             jnp.asarray(dark), jnp.asarray(flat), 0)[0])
    np.testing.assert_allclose(mean, mean1, atol=1e-5)


def test_stack_maximize_and_upscale(tmp_path):
    """-maximize expands the sum-stack canvas; -upscale stacks a x2
    sequence (upscaling.c legacy path)."""
    from siril_tpu.cli.commands import COMMANDS
    from siril_tpu.cli.context import Session
    from siril_tpu.core.image import SirilImage
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(22)
    for i in range(3):
        write_fits(SirilImage(data=rng.uniform(0.2, 0.4, (1, 40, 48))
                              .astype(np.float32)),
                   str(tmp_path / f"mx_{i + 1:05d}.fit"), bitdepth=16)
    ctx = Session(cwd=str(tmp_path))
    seq = ctx.load_sequence("mx_")
    seq.nb_layers = 1
    reg = seq.reg(0)
    for k, (dx, dy) in enumerate([(0, 0), (6, 0), (0, -4)]):
        reg.H[k] = np.eye(3)
        reg.H[k][0, 2] = dx
        reg.H[k][1, 2] = dy
        reg.valid[k] = True
    seq.save()
    COMMANDS["stack"].fn(ctx, ["mx_", "sum", "-maximize", "-out=maxsum"])
    assert ctx.image.width == 48 + 6 and ctx.image.height == 40 + 4

    ctx2 = Session(cwd=str(tmp_path))
    COMMANDS["stack"].fn(ctx2, ["mx_", "rej", "3", "3", "-upscale",
                                "-out=up2"])
    assert ctx2.image.width == 96 and ctx2.image.height == 80


def test_feather_blending_seam(tmp_path, rng):
    """stacking/blending.c seam feathering: two half-coverage frames with
    different levels — feathered stack ramps smoothly across the overlap
    edge instead of jumping (weights = smoothstep distance ramp)."""
    h, w = 40, 120
    files = []
    vals = [0.3, 0.6]
    for i, v in enumerate(vals):
        f = np.zeros((h, w), np.float32)
        if i == 0:
            f[:, : w * 2 // 3] = v      # left 2/3
        else:
            f[:, w // 3:] = v           # right 2/3
        img = SirilImage(data=f[None])
        p = tmp_path / f"m_{i:05d}.fit"
        write_fits(img, p, bitdepth=FLOAT_IMG)
        files.append(str(p))
    # no feather: hard content only
    seq = Sequence.from_files(files, name="m_")
    r0 = stk.stack_sequence(seq, stk.StackArgs(method="rej",
                                               rejection=rj.NO_REJEC))
    # feathered
    seq2 = Sequence.from_files(files, name="m_")
    r1 = stk.stack_sequence(seq2, stk.StackArgs(method="rej",
                                                rejection=rj.NO_REJEC,
                                                feather_dist=20))
    out = r1.image.host()[0]
    row = out[h // 2]
    # in the overlap the feathered result transitions between the two
    # levels: near the left coverage edge it should be closer to the
    # right frame's value and vice versa
    left_edge = w // 3 + 2       # just inside frame-2 coverage
    right_edge = w * 2 // 3 - 3  # just inside frame-1 coverage
    assert row[left_edge] < 0.40         # dominated by frame 1 (0.3)
    assert row[right_edge] > 0.50        # dominated by frame 2 (0.6)
    mid = (np.mean(vals))
    assert abs(row[w // 2] - mid) < 0.05 # balanced at the center
    # monotone ramp across the overlap (no seam jump)
    overlap = row[w // 3 + 1: w * 2 // 3 - 1]
    assert np.all(np.diff(overlap) > -1e-3)
    # unfeathered: equal-weight mean everywhere in overlap
    row0 = r0.image.host()[0][h // 2]
    assert abs(row0[w // 2] - mid) < 1e-5


def test_resident_path_f32_sources(tmp_path, monkeypatch):
    """FLOAT FITS sequences (drizzled/processed) ride the resident
    single-upload path and match the streaming path."""
    import os

    import numpy as np

    from siril_tpu.core.image import SirilImage
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import ADDITIVE_SCALING
    from siril_tpu.ops.stacking import StackArgs, stack_sequence

    rng = np.random.default_rng(2)
    base = np.clip(0.3 + rng.normal(0, 0.01, (32, 40)), 0, 1)
    for i in range(8):
        f = np.clip(base + rng.normal(0, 0.01, base.shape), 0, 1)
        write_fits(SirilImage(data=f.astype(np.float32)[None]),
                   str(tmp_path / f"fl_{i:05d}.fit"), bitdepth=-32)
    args = StackArgs(method="rej", rejection=rj.WINSORIZED,
                     normalize=ADDITIVE_SCALING)

    seq = Sequence.scan("fl_", str(tmp_path))
    res_resident = stack_sequence(seq, args)

    monkeypatch.setenv("SIRIL_TPU_RESIDENT_BUDGET", "1")   # force stream
    seq2 = Sequence.scan("fl_", str(tmp_path))
    res_stream = stack_sequence(seq2, args)
    np.testing.assert_allclose(res_resident.image.host(),
                               res_stream.image.host(), atol=1e-5)


def test_fused_pipeline_step_multichip_rotation_warp():
    """The sharded fused step with the FFT three-shear rotation warp:
    frame-sharded FFTs stay device-local; the 8-device mesh result must
    match the 1-device mesh AND a host composition of the un-sharded
    shear warp + stack."""
    import jax
    import jax.numpy as jnp

    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.interp import rot_shear_core
    from siril_tpu.ops.normalization import NO_NORM
    from siril_tpu.parallel.sharding import fused_pipeline_step, make_mesh

    devs = jax.devices()
    if len(devs) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(17)
    N, H, W = 6, 32, 40
    raw = rng.integers(-20000, 20000, (N, H, W)).astype(np.int16)
    th = rng.uniform(-0.02, 0.02, N)
    rot = np.zeros((N, 5), np.float32)
    rot[:, 0] = np.cos(th)
    rot[:, 1] = np.sin(th)
    rot[:, 2:4] = rng.uniform(-2, 2, (N, 2))
    rot[2, 4] = 1.0                       # one meridian-flipped frame
    dark = np.full((H, W), 0.005, np.float32)
    flat = np.ones((H, W), np.float32)

    mesh = make_mesh(2, 4, devices=devs[:8])
    step = fused_pipeline_step(mesh, rj.SIGMA, NO_NORM, 3.0, 3.0,
                               N, H, W, rot_warp=True)
    mean, rl, rh = step(jnp.asarray(raw), jnp.asarray(rot),
                        jnp.asarray(dark), jnp.asarray(flat), 0)
    mean = np.asarray(mean)
    assert np.isfinite(mean).all()

    mesh1 = make_mesh(1, 1, devices=devs[:1])
    step1 = fused_pipeline_step(mesh1, rj.SIGMA, NO_NORM, 3.0, 3.0,
                                N, H, W, rot_warp=True)
    mean1 = np.asarray(step1(jnp.asarray(raw), jnp.asarray(rot),
                             jnp.asarray(dark), jnp.asarray(flat), 0)[0])
    np.testing.assert_allclose(mean, mean1, atol=1e-5)

    # host oracle: decode+calibrate, un-sharded shear warp, plain
    # sigma-clip mean over the warped stack
    x = (raw.astype(np.float32) + 32768.0) / 65535.0 - dark[None]
    w = np.asarray(rot_shear_core(jnp.asarray(x[:, None]),
                                  jnp.asarray(rot[:, 0]),
                                  jnp.asarray(rot[:, 1]),
                                  jnp.asarray(rot[:, 2:4]),
                                  jnp.asarray(rot[:, 4] > 0.5),
                                  clamp=False))[:, 0]
    flat_px = w.reshape(N, H * W)
    # zero pixels are invalid to the kernel; compare only where all
    # frames are valid and nothing was rejected
    valid = (flat_px != 0.0).all(0) & (np.asarray(rl) + np.asarray(rh)
                                       == 0).reshape(-1)
    expect = flat_px.mean(0)
    np.testing.assert_allclose(mean[valid], expect[valid], atol=1e-4)


def test_fused_pipeline_step_multichip_affine_warp():
    """The sharded fused step with the two-pass chirp-Z affine warp
    (scale/skew family): the 8-device mesh result must match the
    1-device mesh AND a host composition of the un-sharded CZT warp +
    sigma-clip stack."""
    import jax
    import jax.numpy as jnp

    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.interp import _sig_pair, affines_from_Hs
    from siril_tpu.ops.interp import affine_czt_core
    from siril_tpu.ops.normalization import NO_NORM
    from siril_tpu.parallel.sharding import fused_pipeline_step, make_mesh

    devs = jax.devices()
    if len(devs) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(23)
    N, H, W = 6, 32, 40
    raw = rng.integers(-20000, 20000, (N, H, W)).astype(np.int16)
    Hs = np.tile(np.eye(3), (N, 1, 1))
    c = np.array([(W - 1) / 2, (H - 1) / 2])
    for i in range(N):
        th = rng.uniform(-0.02, 0.02)
        sx = 1.0 + rng.uniform(-0.02, 0.02)
        sy = 1.0 + rng.uniform(-0.02, 0.02)
        R = np.array([[np.cos(th), -np.sin(th)],
                      [np.sin(th), np.cos(th)]])
        if i == 2:                                 # one flipped frame
            R = -R
        A = R @ np.diag([sx, sy])
        Hs[i, :2, :2] = A
        Hs[i, :2, 2] = c - A @ c + rng.uniform(-1.5, 1.5, 2)
    aff = affines_from_Hs(Hs, (H, W))
    assert aff is not None and aff[2][2]
    M, b, flip = aff
    sx_hi, sx_lo = _sig_pair(
        (M[:, 0, 0] * M[:, 1, 1] - M[:, 0, 1] * M[:, 1, 0])
        / M[:, 1, 1] / W)
    sy_hi, sy_lo = _sig_pair(M[:, 1, 1] / H)
    packed = np.concatenate(
        [M.reshape(N, 4), b, flip[:, None].astype(np.float64),
         sx_hi[:, None], sx_lo[:, None], sy_hi[:, None], sy_lo[:, None]],
        axis=1).astype(np.float32)
    dark = np.full((H, W), 0.005, np.float32)
    flat = np.ones((H, W), np.float32)

    mesh = make_mesh(2, 4, devices=devs[:8])
    step = fused_pipeline_step(mesh, rj.SIGMA, NO_NORM, 3.0, 3.0,
                               N, H, W, aff_warp=True)
    mean, rl, rh = step(jnp.asarray(raw), jnp.asarray(packed),
                        jnp.asarray(dark), jnp.asarray(flat), 0)
    mean = np.asarray(mean)
    assert np.isfinite(mean).all()

    mesh1 = make_mesh(1, 1, devices=devs[:1])
    step1 = fused_pipeline_step(mesh1, rj.SIGMA, NO_NORM, 3.0, 3.0,
                                N, H, W, aff_warp=True)
    mean1 = np.asarray(step1(jnp.asarray(raw), jnp.asarray(packed),
                             jnp.asarray(dark), jnp.asarray(flat), 0)[0])
    np.testing.assert_allclose(mean, mean1, atol=1e-5)

    # host oracle: decode+calibrate, un-sharded CZT warp, plain
    # sigma-clip mean over the warped stack
    x = (raw.astype(np.float32) + 32768.0) / 65535.0 - dark[None]
    w = np.asarray(affine_czt_core(
        jnp.asarray(x[:, None]), jnp.asarray(M, jnp.float32),
        jnp.asarray(b, jnp.float32), jnp.asarray(flip),
        (jnp.asarray(sx_hi), jnp.asarray(sx_lo)),
        (jnp.asarray(sy_hi), jnp.asarray(sy_lo)), clamp=False))[:, 0]
    flat_px = w.reshape(N, H * W)
    valid = (flat_px != 0.0).all(0) & (np.asarray(rl) + np.asarray(rh)
                                       == 0).reshape(-1)
    expect = flat_px.mean(0)
    np.testing.assert_allclose(mean[valid], expect[valid], atol=1e-4)


def test_fused_pipeline_step_multichip_perspective_warp():
    """The sharded fused step with the perspective (affine chirp-Z +
    residual shift) warp family: the 8-device mesh result must match
    the 1-device mesh AND a host composition of the un-sharded
    perspective core + sigma-clip stack."""
    import jax
    import jax.numpy as jnp

    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.interp import (_sig_pair, perspective_czt_core,
                                      perspective_split_from_Hs)
    from siril_tpu.ops.normalization import NO_NORM
    from siril_tpu.parallel.sharding import fused_pipeline_step, make_mesh

    devs = jax.devices()
    if len(devs) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(29)
    N, H, W = 6, 32, 40
    raw = rng.integers(-20000, 20000, (N, H, W)).astype(np.int16)
    Hs = np.tile(np.eye(3), (N, 1, 1))
    c = np.array([(W - 1) / 2, (H - 1) / 2])
    for i in range(N):
        th = rng.uniform(-0.02, 0.02)
        sx = 1.0 + rng.uniform(-0.015, 0.015)
        sy = 1.0 + rng.uniform(-0.015, 0.015)
        R = np.array([[np.cos(th), -np.sin(th)],
                      [np.sin(th), np.cos(th)]])
        if i == 3:                                 # one flipped frame
            R = -R
        A = R @ np.diag([sx, sy])
        Hs[i, :2, :2] = A
        Hs[i, :2, 2] = c - A @ c + rng.uniform(-1.5, 1.5, 2)
        Hs[i, 2, :2] = rng.uniform(-1.0, 1.0, 2) * 4e-4
    persp = perspective_split_from_Hs(Hs, (H, W))
    assert persp is not None and persp[2][3]
    M, b, flip, K, D = persp
    sx_hi, sx_lo = _sig_pair(
        (M[:, 0, 0] * M[:, 1, 1] - M[:, 0, 1] * M[:, 1, 0])
        / M[:, 1, 1] / W)
    sy_hi, sy_lo = _sig_pair(M[:, 1, 1] / H)
    packed = np.concatenate(
        [M.reshape(N, 4), b, K.reshape(N, 9),
         flip[:, None].astype(np.float64),
         sx_hi[:, None], sx_lo[:, None], sy_hi[:, None], sy_lo[:, None]],
        axis=1).astype(np.float32)
    dark = np.full((H, W), 0.005, np.float32)
    flat = np.ones((H, W), np.float32)

    mesh = make_mesh(2, 4, devices=devs[:8])
    step = fused_pipeline_step(mesh, rj.SIGMA, NO_NORM, 3.0, 3.0,
                               N, H, W, persp_warp=int(D))
    mean, rl, rh = step(jnp.asarray(raw), jnp.asarray(packed),
                        jnp.asarray(dark), jnp.asarray(flat), 0)
    mean = np.asarray(mean)
    assert np.isfinite(mean).all()

    mesh1 = make_mesh(1, 1, devices=devs[:1])
    step1 = fused_pipeline_step(mesh1, rj.SIGMA, NO_NORM, 3.0, 3.0,
                                N, H, W, persp_warp=int(D))
    mean1 = np.asarray(step1(jnp.asarray(raw), jnp.asarray(packed),
                             jnp.asarray(dark), jnp.asarray(flat), 0)[0])
    np.testing.assert_allclose(mean, mean1, atol=1e-5)

    # host oracle: decode+calibrate, un-sharded perspective core, plain
    # sigma-clip mean over the warped stack
    x = (raw.astype(np.float32) + 32768.0) / 65535.0 - dark[None]
    w = np.asarray(perspective_czt_core(
        jnp.asarray(x[:, None]), jnp.asarray(M, jnp.float32),
        jnp.asarray(b, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(np.asarray(flip, bool)),
        (jnp.asarray(sx_hi), jnp.asarray(sx_lo)),
        (jnp.asarray(sy_hi), jnp.asarray(sy_lo)),
        D=int(D), clamp=False))[:, 0]
    flat_px = w.reshape(N, H * W)
    valid = (flat_px != 0.0).all(0) & (np.asarray(rl) + np.asarray(rh)
                                       == 0).reshape(-1)
    expect = flat_px.mean(0)
    np.testing.assert_allclose(mean[valid], expect[valid], atol=1e-4)
