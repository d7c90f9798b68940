"""Fused HBM-resident pipeline tests (siril_tpu/pipeline.py)."""

import os

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.io.fits_io import write_fits
from siril_tpu.ops import rejection as rj
from siril_tpu.ops.normalization import ADDITIVE_SCALING
from siril_tpu.ops.stacking import StackArgs
from siril_tpu.pipeline import FusedArgs, fused_preprocess_stack
from siril_tpu.registration.starfinder import StarFinderParams


def make_seq(tmp_path, rng, shifts, with_gradient=False):
    h, w = 160, 192
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.05 + rng.normal(0, 0.002, (h, w)).astype(np.float32)
    for _ in range(16):
        x0 = rng.uniform(30, w - 30)
        y0 = rng.uniform(30, h - 30)
        base += 0.5 * np.exp(-(((xx + 0.5 - x0) ** 2 +
                                (yy + 0.5 - y0) ** 2) / (2 * 2.0 ** 2)))
    base = np.clip(base, 0, 1)
    for i, (dx, dy) in enumerate(shifts):
        f = np.roll(np.roll(base, dy, 0), dx, 1) \
            + rng.normal(0, 0.002, (h, w)).astype(np.float32)
        f[rng.integers(0, h, 30), rng.integers(0, w, 30)] = 0.95
        img = SirilImage(data=np.clip(f, 1e-4, 1)[None])
        img.keywords.exposure = 10.0
        write_fits(img, str(tmp_path / f"fl_{i:05d}.fit"), bitdepth=16)
    return Sequence.scan("fl_", str(tmp_path)), base


def test_fused_register_and_stack(tmp_path):
    rng = np.random.default_rng(3)
    seq, base = make_seq(tmp_path, rng,
                         [(0, 0), (4, 2), (-3, 5), (6, -4), (2, 2)])
    args = FusedArgs(stack=StackArgs(method="rej", rejection=rj.WINSORIZED,
                                     normalize=ADDITIVE_SCALING),
                     starfinder=StarFinderParams(radius=6))
    res = fused_preprocess_stack(seq, args)
    out = res.image.host()[0]
    interior = np.s_[20:-20, 20:-20]
    err = np.abs(out[interior] - base[interior]).mean()
    # aligned, cosmic rays rejected, no intermediate sequences written
    assert err < 0.01
    assert out[interior].max() < 0.9
    assert sum(res.total_rejected) > 0
    assert not any(f.startswith(("pp_", "r_"))
                   for f in os.listdir(tmp_path))
    # regdata was still recorded in the sequence (checkpoint parity)
    assert seq.reg(0).valid.sum() == 5


def test_fused_with_calibration(tmp_path):
    from siril_tpu.ops.calibration import CalibArgs

    rng = np.random.default_rng(4)
    seq, base = make_seq(tmp_path, rng, [(0, 0), (2, -1), (-1, 3)])
    dark_level = 0.02
    dark = SirilImage(data=np.full((1, 160, 192), dark_level, np.float32))
    # frames don't contain the dark, but subtracting it must shift levels
    args = FusedArgs(calib=CalibArgs(dark=dark, use_cosmetic=False),
                     stack=StackArgs(method="rej", rejection=rj.SIGMA),
                     starfinder=StarFinderParams(radius=6))
    res = fused_preprocess_stack(seq, args)
    out = res.image.host()[0]
    # background ≈ base background − dark level
    bg_out = np.median(out)
    bg_base = np.median(base)
    assert abs((bg_base - bg_out) - dark_level) < 0.005


def test_fusedstack_command(tmp_path):
    from siril_tpu.cli.commands import COMMANDS
    from siril_tpu.cli.context import Session

    rng = np.random.default_rng(5)
    make_seq(tmp_path, rng, [(0, 0), (3, 1), (-2, 2)])
    ctx = Session(cwd=str(tmp_path))
    COMMANDS["fusedstack"].fn(ctx, ["fl_", "rej", "3", "3", "-out=final"])
    assert os.path.exists(tmp_path / "final.fit")
    assert ctx.image is not None


def test_fused_output_norm(tmp_path):
    """-output_norm rescales the fused result into [0,1] (regression:
    norm_to_0_1_range import was dropped in a refactor)."""
    rng = np.random.default_rng(6)
    seq, base = make_seq(tmp_path, rng, [(0, 0), (2, 1), (-1, 2)])
    sa = StackArgs(method="rej", rejection=rj.SIGMA, output_norm=True)
    res = fused_preprocess_stack(
        seq, FusedArgs(stack=sa, starfinder=StarFinderParams(radius=6)))
    out = res.image.host()
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_fused_gesdt_rejects(tmp_path):
    """Regression: the fused path hardcoded max_outliers=0 for GESDT,
    silently producing a plain mean — it must wire the outlier budget
    and the ESD critical-value table like the staged path
    (ops/stacking.py)."""
    rng = np.random.default_rng(13)
    shifts = [(0, 0), (2, 1), (-1, 3), (4, -2), (1, 1), (-2, 2), (3, 3)]
    seq, base = make_seq(tmp_path, rng, shifts)
    sa = StackArgs(method="rej", rejection=rj.GESDT,
                   siglow=0.3, sighigh=0.05, normalize=ADDITIVE_SCALING)
    res = fused_preprocess_stack(
        seq, FusedArgs(stack=sa, starfinder=StarFinderParams(radius=6)))
    # cosmic-ray spikes (0.95) must be ESD-rejected, not averaged in
    assert sum(res.total_rejected) > 0
    out = res.image.host()[0]
    interior = np.s_[20:-20, 20:-20]
    assert out[interior].max() < 0.9


def test_fused_multichunk_matches_single_chunk(tmp_path):
    """The chunk-list path (frames kept as a list, per-chunk warp with
    donation, row-block streamed stack) must equal the one-chunk path."""
    rng = np.random.default_rng(9)
    shifts = [(0, 0), (3, 1), (-2, 4), (5, -3), (1, 2), (-4, -1), (2, 3)]
    seq, base = make_seq(tmp_path, rng, shifts)
    sa = StackArgs(method="rej", rejection=rj.WINSORIZED,
                   normalize=ADDITIVE_SCALING)
    sf = StarFinderParams(radius=6)
    res1 = fused_preprocess_stack(
        seq, FusedArgs(stack=sa, starfinder=sf, frame_chunk=64))
    seq2 = Sequence.scan("fl_", str(tmp_path))
    res2 = fused_preprocess_stack(
        seq2, FusedArgs(stack=sa, starfinder=sf, frame_chunk=3))
    a = res1.image.host()
    b = res2.image.host()
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert res1.total_rejected == res2.total_rejected


def test_fused_multichunk_excludes_bad_frame(tmp_path):
    """A frame that cannot match (pure noise) is excluded even when it
    sits inside a middle chunk."""
    rng = np.random.default_rng(11)
    shifts = [(0, 0), (2, 1), (-1, 3), (4, -2), (1, 1)]
    seq, base = make_seq(tmp_path, rng, shifts)
    # overwrite frame 2 with a flat starless field (no candidates)
    img = SirilImage(data=np.full((1, 160, 192), 0.05, np.float32))
    write_fits(img, str(tmp_path / "fl_00002.fit"), bitdepth=16)
    seq = Sequence.scan("fl_", str(tmp_path))
    res = fused_preprocess_stack(
        seq, FusedArgs(stack=StackArgs(method="rej",
                                       rejection=rj.WINSORIZED,
                                       normalize=ADDITIVE_SCALING),
                       starfinder=StarFinderParams(radius=6),
                       frame_chunk=2))
    assert not seq.incl[2]
    out = res.image.host()[0]
    interior = np.s_[20:-20, 20:-20]
    assert np.abs(out[interior] - base[interior]).mean() < 0.01


def test_fused_rotation_takes_shear_path(tmp_path, monkeypatch):
    """Rotated frames (field rotation) must engage the FFT three-shear
    warp fast path — not the gather-based homography warp — and still
    align the stack to the base scene."""
    from siril_tpu.ops import interp as interp_mod
    from siril_tpu.registration.matching import HOMOGRAPHY_TRANSFORMATION

    rng = np.random.default_rng(11)
    h, w = 160, 192
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    stars = [(rng.uniform(30, w - 30), rng.uniform(30, h - 30))
             for _ in range(22)]

    def render(theta_deg, tx, ty):
        th = np.deg2rad(theta_deg)
        c, s = np.cos(th), np.sin(th)
        cx, cy = (w - 1) / 2, (h - 1) / 2
        img = np.full((h, w), 0.05, np.float32)
        for x0, y0 in stars:
            xr = c * (x0 - cx) - s * (y0 - cy) + cx + tx
            yr = s * (x0 - cx) + c * (y0 - cy) + cy + ty
            img += 0.5 * np.exp(-(((xx - xr) ** 2 + (yy - yr) ** 2)
                                  / (2 * 2.0 ** 2)))
        return np.clip(img, 0, 1)

    base = render(0, 0, 0)
    params = [(0, 0, 0), (0.6, 2, -1), (-0.8, -2, 2), (0.4, 1, 1),
              (-0.5, 3, -2)]
    for i, (th, tx, ty) in enumerate(params):
        f = render(th, tx, ty) + rng.normal(0, 0.002, (h, w)).astype(
            np.float32)
        img = SirilImage(data=np.clip(f, 1e-4, 1)[None])
        img.keywords.exposure = 10.0
        write_fits(img, str(tmp_path / f"rot_{i:05d}.fit"), bitdepth=16)
    seq = Sequence.scan("rot_", str(tmp_path))

    calls = {"shear": 0, "gather": 0}
    real_rot = interp_mod.warp_rotation_batch
    real_hom = interp_mod.warp_homography_batch

    def spy_rot(*a, **k):
        calls["shear"] += 1
        return real_rot(*a, **k)

    def spy_hom(*a, **k):
        calls["gather"] += 1
        return real_hom(*a, **k)

    monkeypatch.setattr(interp_mod, "warp_rotation_batch", spy_rot)
    monkeypatch.setattr(interp_mod, "warp_homography_batch", spy_hom)
    args = FusedArgs(ttype=HOMOGRAPHY_TRANSFORMATION,
                     stack=StackArgs(method="rej", rejection=rj.WINSORIZED,
                                     normalize=ADDITIVE_SCALING),
                     starfinder=StarFinderParams(radius=6))
    res = fused_preprocess_stack(seq, args)
    assert calls["shear"] > 0 and calls["gather"] == 0
    out = res.image.host()[0]
    interior = np.s_[20:-20, 20:-20]
    assert np.abs(out[interior] - base[interior]).mean() < 0.01


def test_fused_affine_takes_czt_path(tmp_path, monkeypatch):
    """Frames with a small scale difference (focal drift between
    sessions) must engage the two-pass chirp-Z affine warp — not the
    gather-based homography warp — and still align the stack."""
    from siril_tpu.ops import interp as interp_mod
    from siril_tpu.registration.matching import AFFINE_TRANSFORMATION

    rng = np.random.default_rng(13)
    h, w = 160, 192
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    stars = [(rng.uniform(30, w - 30), rng.uniform(30, h - 30))
             for _ in range(22)]

    def render(scale, theta_deg, tx, ty):
        th = np.deg2rad(theta_deg)
        c, s = np.cos(th) * scale, np.sin(th) * scale
        cx, cy = (w - 1) / 2, (h - 1) / 2
        img = np.full((h, w), 0.05, np.float32)
        for x0, y0 in stars:
            xr = c * (x0 - cx) - s * (y0 - cy) + cx + tx
            yr = s * (x0 - cx) + c * (y0 - cy) + cy + ty
            img += 0.5 * np.exp(-(((xx - xr) ** 2 + (yy - yr) ** 2)
                                  / (2 * 2.0 ** 2)))
        return np.clip(img, 0, 1)

    base = render(1.0, 0, 0, 0)
    params = [(1.0, 0, 0, 0), (1.02, 0.6, 2, -1), (0.985, -0.8, -2, 2),
              (1.015, 0.4, 1, 1), (0.99, -0.5, 3, -2)]
    for i, (sc, th, tx, ty) in enumerate(params):
        f = render(sc, th, tx, ty) + rng.normal(0, 0.002, (h, w)).astype(
            np.float32)
        img = SirilImage(data=np.clip(f, 1e-4, 1)[None])
        img.keywords.exposure = 10.0
        write_fits(img, str(tmp_path / f"aff_{i:05d}.fit"), bitdepth=16)
    seq = Sequence.scan("aff_", str(tmp_path))

    calls = {"czt": 0, "gather": 0, "shear": 0}
    real_aff = interp_mod.warp_affine_batch
    real_hom = interp_mod.warp_homography_batch
    real_rot = interp_mod.warp_rotation_batch
    monkeypatch.setattr(interp_mod, "warp_affine_batch",
                        lambda *a, **k: (calls.__setitem__(
                            "czt", calls["czt"] + 1), real_aff(*a, **k))[1])
    monkeypatch.setattr(interp_mod, "warp_homography_batch",
                        lambda *a, **k: (calls.__setitem__(
                            "gather", calls["gather"] + 1),
                            real_hom(*a, **k))[1])
    monkeypatch.setattr(interp_mod, "warp_rotation_batch",
                        lambda *a, **k: (calls.__setitem__(
                            "shear", calls["shear"] + 1),
                            real_rot(*a, **k))[1])
    args = FusedArgs(ttype=AFFINE_TRANSFORMATION,
                     stack=StackArgs(method="rej", rejection=rj.WINSORIZED,
                                     normalize=ADDITIVE_SCALING),
                     starfinder=StarFinderParams(radius=6))
    res = fused_preprocess_stack(seq, args)
    assert calls["czt"] > 0 and calls["gather"] == 0
    out = res.image.host()[0]
    interior = np.s_[20:-20, 20:-20]
    assert np.abs(out[interior] - base[interior]).mean() < 0.01


def test_fused_perspective_takes_split_path(tmp_path, monkeypatch):
    """Genuinely projective registrations (mosaic tile / astrometric H)
    must engage the affine-CZT + residual-shift perspective warp — not
    the gather-based homography warp — and still align the stack."""
    from siril_tpu.ops import interp as interp_mod
    from siril_tpu.registration.matching import HOMOGRAPHY_TRANSFORMATION

    rng = np.random.default_rng(17)
    h, w = 160, 192
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    stars = [(rng.uniform(30, w - 30), rng.uniform(30, h - 30))
             for _ in range(24)]
    c = np.array([(w - 1) / 2, (h - 1) / 2])

    def mk_H(scale, deg, tx, ty, g1, g2):
        th = np.deg2rad(deg)
        A = scale * np.array([[np.cos(th), -np.sin(th)],
                              [np.sin(th), np.cos(th)]])
        Hm = np.eye(3)
        Hm[:2, :2] = A
        Hm[:2, 2] = c - A @ c + [tx, ty]
        Hm[2, :2] = [g1, g2]
        return Hm

    def render(Hm):
        img = np.full((h, w), 0.05, np.float32)
        for x0, y0 in stars:
            v = Hm @ [x0, y0, 1.0]
            xr, yr = v[0] / v[2], v[1] / v[2]
            img += 0.5 * np.exp(-(((xx - xr) ** 2 + (yy - yr) ** 2)
                                  / (2 * 2.0 ** 2)))
        return np.clip(img, 0, 1)

    base = render(np.eye(3))
    maps = [np.eye(3),
            mk_H(1.004, 0.5, 2, -1, 2e-4, -1.2e-4),
            mk_H(0.997, -0.7, -2, 2, -1.5e-4, 1e-4),
            mk_H(1.002, 0.3, 1, 1, 1.2e-4, 1.8e-4),
            mk_H(0.999, -0.4, 3, -2, -2e-4, -1e-4)]
    for i, Hm in enumerate(maps):
        f = render(Hm) + rng.normal(0, 0.002, (h, w)).astype(np.float32)
        img = SirilImage(data=np.clip(f, 1e-4, 1)[None])
        img.keywords.exposure = 10.0
        write_fits(img, str(tmp_path / f"per_{i:05d}.fit"), bitdepth=16)
    seq = Sequence.scan("per_", str(tmp_path))

    calls = {"persp": 0, "gather": 0, "shear": 0, "czt": 0}
    real = {k: getattr(interp_mod, n) for k, n in
            (("persp", "warp_perspective_batch"),
             ("gather", "warp_homography_batch"),
             ("shear", "warp_rotation_batch"),
             ("czt", "warp_affine_batch"))}

    def spy(key):
        def run(*a, **kw):
            calls[key] += 1
            return real[key](*a, **kw)
        return run

    monkeypatch.setattr(interp_mod, "warp_perspective_batch", spy("persp"))
    monkeypatch.setattr(interp_mod, "warp_homography_batch", spy("gather"))
    monkeypatch.setattr(interp_mod, "warp_rotation_batch", spy("shear"))
    monkeypatch.setattr(interp_mod, "warp_affine_batch", spy("czt"))
    args = FusedArgs(ttype=HOMOGRAPHY_TRANSFORMATION,
                     stack=StackArgs(method="rej", rejection=rj.WINSORIZED,
                                     normalize=ADDITIVE_SCALING),
                     starfinder=StarFinderParams(radius=6))
    res = fused_preprocess_stack(seq, args)
    assert calls["persp"] > 0 and calls["gather"] == 0
    assert calls["shear"] == 0 and calls["czt"] == 0
    out = res.image.host()[0]
    interior = np.s_[24:-24, 24:-24]
    assert np.abs(out[interior] - base[interior]).mean() < 0.01
