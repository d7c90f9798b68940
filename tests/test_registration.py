"""Registration tests: star detection accuracy, PSF fit parity with model
parameters, matching robustness, end-to-end register+apply+stack."""

import numpy as np
import pytest

from siril_tpu.core.image import FLOAT_IMG, SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.io.fits_io import write_fits
from siril_tpu.registration import matching as mt
from siril_tpu.registration.global_reg import (
    ApplyRegArgs,
    FRAMING_MAX,
    RegArgs,
    apply_reg_sequence,
    register_sequence,
)
from siril_tpu.registration.psf import PROFILE_GAUSSIAN, fit_psf_batch
from siril_tpu.registration.shift import phase_correlate, register_shift_dft
from siril_tpu.registration.starfinder import StarFinderParams, detect_stars


def star_field(rng, h=200, w=240, n=20, noise=0.002, margin=25):
    """Synthetic field; returns (image, positions)."""
    img = 0.05 + rng.normal(0, noise, (h, w)).astype(np.float32)
    pos = []
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n):
        x = rng.uniform(margin, w - margin)
        y = rng.uniform(margin, h - margin)
        A = rng.uniform(0.15, 0.7)
        s = rng.uniform(1.5, 2.5)
        img += (A * np.exp(-(((xx + 0.5 - x) ** 2 + (yy + 0.5 - y) ** 2)
                             / (2 * s * s)))).astype(np.float32)
        pos.append((x, y))
    return np.clip(img, 0, 1), np.array(pos)


class TestPSFFit:
    def test_recovers_parameters(self, rng):
        S = 21
        yy, xx = np.mgrid[0:S, 0:S]
        B, A, x0, y0, sx, sy = 0.1, 0.6, 10.3, 9.7, 6.0, 4.0
        patch = B + A * np.exp(-(((xx + 0.5 - x0) ** 2) / sx
                                 + ((yy + 0.5 - y0) ** 2) / sy))
        fit = fit_psf_batch(patch[None].astype(np.float32))
        assert fit["B"][0] == pytest.approx(B, abs=0.01)
        assert fit["A"][0] == pytest.approx(A, abs=0.02)
        assert fit["x0"][0] == pytest.approx(x0, abs=0.05)
        assert fit["y0"][0] == pytest.approx(y0, abs=0.05)
        assert fit["sx"][0] == pytest.approx(sx, rel=0.05)
        assert fit["sy"][0] == pytest.approx(sy, rel=0.05)


class TestStarFinder:
    def test_detects_and_localizes(self, rng):
        img, pos = star_field(rng)
        stars = detect_stars(img, StarFinderParams(radius=8))
        assert len(stars) >= len(pos) * 0.7
        errs = []
        for (x, y) in pos:
            d = min(np.hypot(s.x0 - x, s.y0 - y) for s in stars)
            errs.append(d)
        assert np.median(errs) < 0.3

    def test_empty_image(self, rng):
        img = 0.05 + rng.normal(0, 0.001, (128, 128)).astype(np.float32)
        stars = detect_stars(np.clip(img, 0, 1))
        assert len(stars) <= 3


class TestPhaseCorrelation:
    def test_integer_shift(self, rng):
        img, _ = star_field(rng, h=128, w=128, n=10)
        # content displaced by (dx=-8, dy=+5) → frame→ref translation (+8, −5)
        shifted = np.roll(np.roll(img, 5, axis=0), -8, axis=1)
        d = phase_correlate(img, shifted[None], subpixel=False)
        assert d[0][0] == pytest.approx(8, abs=0.5)
        assert d[0][1] == pytest.approx(-5, abs=0.5)


def make_shifted_seq(tmp_path, rng, shifts, n=None):
    base, pos = star_field(rng, h=160, w=192, n=18, margin=35)
    files = []
    for i, (dx, dy) in enumerate(shifts):
        f = np.roll(np.roll(base, dy, axis=0), dx, axis=1)
        f = f + rng.normal(0, 0.002, f.shape).astype(np.float32)
        img = SirilImage(data=np.clip(f, 0, 1)[None])
        img.keywords.exposure = 10.0
        p = tmp_path / f"im_{i:05d}.fit"
        write_fits(img, p, bitdepth=FLOAT_IMG)
        files.append(str(p))
    return Sequence.from_files(files, name="im_"), base


class TestGlobalRegistration:
    def test_register_recovers_shifts(self, tmp_path, rng):
        shifts = [(0, 0), (4, 2), (-3, 5), (6, -4)]
        seq, base = make_shifted_seq(tmp_path, rng, shifts)
        args = RegArgs(two_pass=True, output=False,
                       starfinder=StarFinderParams(radius=6))
        register_sequence(seq, args)
        reg = seq.reg(0)
        assert reg.valid.sum() == 4
        # H maps frame→ref: content displaced by +d needs translation −d
        for i, (dx, dy) in enumerate(shifts):
            # after 2-pass rebase ref may change; compare relative to frame 0
            H0 = np.linalg.inv(reg.H[0]) @ reg.H[i]
            assert H0[0, 2] == pytest.approx(-dx, abs=0.3), f"frame {i} dx"
            assert H0[1, 2] == pytest.approx(-dy, abs=0.3), f"frame {i} dy"

    def test_register_output_aligns(self, tmp_path, rng):
        shifts = [(0, 0), (5, 3), (-4, 2)]
        seq, base = make_shifted_seq(tmp_path, rng, shifts)
        res = register_sequence(seq, RegArgs(
            starfinder=StarFinderParams(radius=6)))
        assert res.new_seq is not None and res.new_seq.number == 3
        # all output frames should match frame content of the reference
        ref = res.new_seq.read_frame(0).host()[0]
        for i in range(1, 3):
            f = res.new_seq.read_frame(i).host()[0]
            interior = np.s_[20:-20, 20:-20]
            diff = np.abs(f[interior] - ref[interior]).mean()
            assert diff < 0.01, f"frame {i} misaligned (diff {diff})"

    def test_apply_reg_with_framing(self, tmp_path, rng):
        shifts = [(0, 0), (6, 0), (0, 6)]
        seq, base = make_shifted_seq(tmp_path, rng, shifts)
        register_sequence(seq, RegArgs(two_pass=True, output=False,
                                       starfinder=StarFinderParams(radius=6)))
        res = apply_reg_sequence(seq, ApplyRegArgs(framing=FRAMING_MAX))
        assert res.new_seq is not None
        # max framing must be at least as large as the input
        assert res.new_seq.rx >= seq.rx and res.new_seq.ry >= seq.ry


class TestShiftDFT:
    def test_dft_registration(self, tmp_path, rng):
        shifts = [(0, 0), (3, -2), (-5, 4)]
        seq, base = make_shifted_seq(tmp_path, rng, shifts)
        register_shift_dft(seq)
        reg = seq.reg(0)
        for i, (dx, dy) in enumerate(shifts):
            assert reg.H[i][0, 2] == pytest.approx(-dx, abs=0.5), f"f{i} dx"
            assert reg.H[i][1, 2] == pytest.approx(-dy, abs=0.5), f"f{i} dy"


# ---------------------------------------------------------------------------
# astrometric registration (astrometric.c compute_Hs_from_astrometry)
# ---------------------------------------------------------------------------


def test_register_astrometric_from_wcs(tmp_path):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.wcs import WCS
    from siril_tpu.registration.astrometric import register_astrometric

    rng = np.random.default_rng(31)
    scale = 2.8e-4                      # deg/px
    files = []
    # three frames whose WCS differ by pure pixel translations
    shifts = [(0.0, 0.0), (12.0, 0.0), (0.0, -8.0)]
    for k, (dx, dy) in enumerate(shifts):
        d = rng.uniform(0.1, 0.4, (1, 64, 64)).astype(np.float32)
        img = SirilImage(data=d)
        img.wcs = WCS(crpix=(32.0 - dx, 32.0 - dy), crval=(180.0, 10.0),
                      cd=np.array([[-scale, 0.0], [0.0, scale]]),
                      height=64)
        p = str(tmp_path / f"ast_{k + 1:05d}.fit")
        write_fits(img, p, bitdepth=-32)
        files.append(p)
    seq = Sequence.from_files(files, name="ast_")
    seq.nb_layers = 1
    seq.reference_image = 0
    n = register_astrometric(seq, 0)
    assert n == 3
    H = seq.reg(0).H
    np.testing.assert_allclose(H[0], np.eye(3), atol=1e-6)
    # crpix shifted by −dx ⇒ frame pixels land dx to the right in ref
    for k, (dx, dy) in enumerate(shifts):
        p = H[k] @ np.array([32.0, 32.0, 1.0])
        p = p[:2] / p[2]
        # top-down pixel convention: FITS crpix y-shift flips sign
        np.testing.assert_allclose(p, [32.0 + dx, 32.0 - dy], atol=0.05)


def test_register_scale_and_extref(tmp_path):
    """register -scale=2 doubles output geometry; -extref aligns against
    an external reference image."""
    from siril_tpu.cli.commands import COMMANDS
    from siril_tpu.cli.context import Session
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(51)
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w]
    stars = [(20, 25), (70, 30), (40, 70), (75, 75), (15, 60),
             (55, 15), (30, 45), (65, 55), (45, 30), (80, 45),
             (25, 80), (60, 85)]

    def render(dx, dy):
        img = rng.normal(0.05, 0.002, (h, w)).astype(np.float32)
        for sx, sy in stars:
            img += 0.6 * np.exp(-(((xx - sx - dx) ** 2 +
                                   (yy - sy - dy) ** 2) / (2 * 1.8 ** 2)))
        return np.clip(img, 0, 1)[None]

    for k, (dx, dy) in enumerate([(0, 0), (3, -2), (-2, 4)]):
        write_fits(SirilImage(data=render(dx, dy)),
                   str(tmp_path / f"rs_{k + 1:05d}.fit"), bitdepth=-32)
    write_fits(SirilImage(data=render(1, 1)), str(tmp_path / "ext.fit"),
               bitdepth=-32)

    ctx = Session(cwd=str(tmp_path))
    COMMANDS["register"].fn(ctx, ["rs_", "-scale=2", "-transf=shift"])
    assert ctx.seq.rx == 2 * w and ctx.seq.ry == 2 * h
    # star lists saved by default (star_finder.c:823 cache behavior)
    import glob as g

    assert g.glob(str(tmp_path / "rs_*.lst"))

    ctx2 = Session(cwd=str(tmp_path))
    COMMANDS["register"].fn(ctx2, ["rs_", "-extref=ext.fit", "-noout",
                                   "-transf=shift", "-nostarlist"])
    seq2 = ctx2.seq
    H = seq2.reg(0).H
    # every frame (incl. frame 0) must carry a shift vs the external ref:
    # frame content at (0,0), ext at (+1,+1) → H maps frame→ext = +1
    assert abs(H[0][0, 2] - 1) < 0.3 and abs(H[0][1, 2] - 1) < 0.3
    assert abs(H[1][0, 2] - (-2)) < 0.3    # ext(+1) − frame(+3) = −2


def test_detect_stars_batch_matches_single(rng):
    """Batched detection finds the same stars as the per-frame path."""
    from siril_tpu.registration.starfinder import (
        StarFinderParams,
        detect_stars,
        detect_stars_batch,
    )

    imgs = []
    poss = []
    for k in range(4):
        img, pos = star_field(rng, h=160, w=160, n=12, margin=30)
        imgs.append(img)
        poss.append(pos)
    batch = detect_stars_batch(np.stack(imgs), StarFinderParams(radius=6))
    assert len(batch) == 4
    for k in range(4):
        single = detect_stars(imgs[k], StarFinderParams(radius=6))
        # same star count within 2 and matching positions
        assert abs(len(batch[k]) - len(single)) <= 2
        for s in single[:8]:
            d = min(np.hypot(t.x0 - s.x0, t.y0 - s.y0) for t in batch[k])
            assert d < 0.5


def test_seqapplyreg_disto_corrects_sip(tmp_path):
    """-disto= master: frames carrying a known SIP distortion are
    straightened by the composed warp."""
    from siril_tpu.cli.commands import COMMANDS
    from siril_tpu.cli.context import Session
    from siril_tpu.ops.wcs import WCS

    rng = np.random.default_rng(63)
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w]
    # true (undistorted) scene
    base = 0.05 + rng.normal(0, 0.002, (h, w)).astype(np.float32)
    pts = [(30, 30), (70, 40), (45, 72)]
    for x0, y0 in pts:
        base += 0.5 * np.exp(-(((xx + 0.5 - x0) ** 2 +
                                (yy + 0.5 - y0) ** 2) / (2 * 2.0 ** 2)))
    # distortion: source = x + A(u,v); build distorted frames by sampling
    # the true scene at x + d(x)
    k = 0.15
    cr = (48.0, 48.0)
    u = xx + 0.5 - cr[0]
    v = yy + 0.5 - cr[1]
    du = k * (u * u) / 48.0
    dv = k * (u * v) / 48.0
    from siril_tpu.ops.interp import INTERP_BILINEAR, sample_plane
    import jax.numpy as jnp

    sx = jnp.asarray((xx + du).astype(np.float32))
    sy = jnp.asarray((yy + dv).astype(np.float32))
    distorted = np.asarray(sample_plane(jnp.asarray(base), sy, sx,
                                        INTERP_BILINEAR))
    for i in range(2):
        img = SirilImage(data=np.clip(
            distorted + rng.normal(0, 0.001, (h, w)), 0, 1)[None]
            .astype(np.float32))
        write_fits(img, str(tmp_path / f"dd_{i + 1:05d}.fit"),
                   bitdepth=-32)
    # master with the SIP A/B terms of that distortion (crpix 1-based)
    A = np.zeros((3, 3)); B = np.zeros((3, 3))
    A[2, 0] = k / 48.0          # u² term
    B[1, 1] = k / 48.0          # u·v term
    master = SirilImage(data=np.zeros((1, h, w), np.float32))
    master.wcs = WCS(crpix=(cr[0] + 1.0, cr[1] + 1.0), crval=(180.0, 10.0),
                     cd=np.array([[-2.8e-4, 0], [0, 2.8e-4]]), height=h,
                     sip_a=A, sip_b=B)
    write_fits(master, str(tmp_path / "master_disto.fit"), bitdepth=-32)

    ctx = Session(cwd=str(tmp_path))
    seq = ctx.load_sequence("dd_")
    seq.nb_layers = 1
    reg = seq.reg(0)
    for i in range(2):
        reg.H[i] = np.eye(3)
        reg.valid[i] = True
    seq.save()
    COMMANDS["seqapplyreg"].fn(ctx, ["dd_", "-disto=master_disto.fit",
                                     "-interp=bi"])
    fixed = ctx.seq.read_frame(0).host()[0]

    def centroid(img2d, x0, y0, r=6):
        ys, xs = np.mgrid[int(y0 - r):int(y0 + r + 1),
                          int(x0 - r):int(x0 + r + 1)]
        patch = img2d[int(y0 - r):int(y0 + r + 1),
                      int(x0 - r):int(x0 + r + 1)].astype(np.float64)
        patch = np.maximum(patch - np.median(patch), 0)
        return (float((xs * patch).sum() / patch.sum()),
                float((ys * patch).sum() / patch.sum()))

    # the (70,40) star has the largest |u| → biggest displacement;
    # undistortion must move it back onto the true position
    tx, ty = 70.0 - 0.5, 40.0 - 0.5
    bx, by = centroid(distorted, 68, 40)
    err_before = np.hypot(bx - tx, by - ty)
    fx_, fy_ = centroid(fixed, 70, 40)
    err_after = np.hypot(fx_ - tx, fy_ - ty)
    assert err_before > 0.8, err_before          # distortion was real
    assert err_after < 0.3 * err_before, (err_before, err_after)


def test_translation_warp_matches_homography_warp():
    """The separable pure-translation warp is numerically identical to
    the general gather-based homography warp."""
    import jax.numpy as jnp

    from siril_tpu.ops.interp import (
        INTERP_BICUBIC,
        INTERP_BILINEAR,
        INTERP_LANCZOS4,
        translations_from_Hs,
        warp_homography,
        warp_translation_batch,
    )

    rng = np.random.default_rng(5)
    f = rng.uniform(0.1, 0.9, (2, 1, 48, 56)).astype(np.float32)
    shifts = np.array([[2.3, -1.7], [-3.1, 0.4]], np.float32)
    for method in (INTERP_BILINEAR, INTERP_BICUBIC, INTERP_LANCZOS4):
        out = np.asarray(warp_translation_batch(jnp.asarray(f), shifts,
                                                method))
        for k in range(2):
            H = np.eye(3)
            H[0, 2], H[1, 2] = shifts[k]
            ref = warp_homography(f[k], H, (48, 56), method, clamp=False)
            interior = np.s_[:, 6:-6, 6:-6]
            assert np.abs(out[k][interior] - ref[interior]).max() < 1e-4
    # ringing clamp parity (sharp star field so the clamp actually fires)
    f2 = np.full((2, 1, 48, 56), 0.02, np.float32)
    f2[:, :, 20:23, 24:27] = 0.95
    for method in (INTERP_BICUBIC, INTERP_LANCZOS4):
        out = np.asarray(warp_translation_batch(jnp.asarray(f2), shifts,
                                                method, clamp=True))
        for k in range(2):
            H = np.eye(3)
            H[0, 2], H[1, 2] = shifts[k]
            ref = warp_homography(f2[k], H, (48, 56), method, clamp=True)
            interior = np.s_[:, 6:-6, 6:-6]
            assert np.abs(out[k][interior] - ref[interior]).max() < 1e-4
    # detector
    Hs = np.tile(np.eye(3), (2, 1, 1))
    Hs[:, 0, 2] = shifts[:, 0]
    Hs[:, 1, 2] = shifts[:, 1]
    np.testing.assert_allclose(translations_from_Hs(Hs), shifts)
    Hs[0, 0, 1] = 0.01
    assert translations_from_Hs(Hs) is None


def test_rotation_shear_warp_matches_ground_truth(rng):
    """The FFT three-shear rotation warp (the fused pipeline's fast
    path for field-rotation registrations) must reproduce an
    analytically re-rendered rotated star field to sinc-interpolation
    accuracy — far tighter than the gather warp's lanczos4 error."""
    import jax.numpy as jnp

    from siril_tpu.ops.interp import (
        rotations_from_Hs,
        warp_rotation_batch,
    )

    H = W = 96
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    stars = list(zip(rng.uniform(18, W - 18, 25),
                     rng.uniform(18, H - 18, 25),
                     rng.uniform(0.2, 0.9, 25)))

    def render(pts):
        img = np.full((H, W), 0.1, np.float32)
        for x0, y0, a in pts:
            img += a * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2)
                              / (2 * 2.2 ** 2))
        return img

    def mk_H(theta_deg, tx, ty):
        th = np.deg2rad(theta_deg)
        c, s = np.cos(th), np.sin(th)
        cx, cy = (W - 1) / 2, (H - 1) / 2
        A = np.array([[c, -s], [s, c]])
        t = np.array([tx, ty]) + np.array([cx, cy]) - A @ [cx, cy]
        Hm = np.eye(3)
        Hm[:2, :2] = A
        Hm[:2, 2] = t
        return Hm

    img = render(stars)
    frames = np.stack([img, img, img])[:, None]
    # third frame: meridian flip (180° + small residual rotation)
    Hs = np.stack([mk_H(0.8, 2.3, -1.7), mk_H(-1.4, -3.1, 0.9),
                   mk_H(180.0 + 0.7, 1.5, -2.0)])
    rot = rotations_from_Hs(Hs, (H, W))
    assert rot is not None
    assert list(rot[3]) == [False, False, True]
    out = np.asarray(warp_rotation_batch(jnp.asarray(frames), rot,
                                         clamp=False))
    I = np.s_[10:-10, 10:-10]
    for k in range(3):
        gt = render([tuple((Hs[k] @ [x0, y0, 1])[:2]) + (a,)
                     for x0, y0, a in stars])
        assert np.abs(out[k, 0][I] - gt[I]).max() < 1e-4

    # out-of-field pixels are masked to 0 (gather-warp semantics):
    # with tx=+2.3 the left edge's sources fall outside the frame
    assert np.abs(out[0, 0, :, 0]).max() == 0.0

    # clamped variant (the pipeline default, opencv.cpp:264-276
    # semantics): substitutes the bilinear guide where the sinc result
    # undershoots it — bilinear-accurate near stars, and it must
    # suppress sinc ringing around a high-contrast point source
    outc = np.asarray(warp_rotation_batch(jnp.asarray(frames), rot,
                                          clamp=True))
    for k in range(3):
        gt = render([tuple((Hs[k] @ [x0, y0, 1])[:2]) + (a,)
                     for x0, y0, a in stars])
        # guide substitution is bilinear-accurate, not sinc-accurate
        assert np.abs(outc[k, 0][I] - gt[I]).max() < 2e-2

    hot = np.zeros((1, 1, H, W), np.float32)
    hot[0, 0, H // 2, W // 2] = 1.0       # sub-sinc-width point source
    rot1 = rotations_from_Hs(Hs[:1], (H, W))
    ring = np.asarray(warp_rotation_batch(jnp.asarray(hot), rot1,
                                          clamp=False))[0, 0]
    ringc = np.asarray(warp_rotation_batch(jnp.asarray(hot), rot1,
                                           clamp=True))[0, 0]
    assert ring.min() < -0.05             # sinc rings hard on a delta
    assert ringc.min() > 0.5 * ring.min()  # clamp suppresses the lobes


def test_rotations_from_Hs_gates():
    """Scale/skew/perspective/large-angle homographies must NOT take
    the shear fast path."""
    from siril_tpu.ops.interp import rotations_from_Hs

    def rot_H(deg):
        th = np.deg2rad(deg)
        c, s = np.cos(th), np.sin(th)
        Hm = np.eye(3)
        Hm[:2, :2] = [[c, -s], [s, c]]
        return Hm

    size = (96, 96)
    ok = rotations_from_Hs(np.stack([rot_H(0.5), rot_H(-3.0)]), size)
    assert ok is not None
    p, q, t, flip = ok
    np.testing.assert_allclose(p ** 2 + q ** 2, 1.0, atol=1e-12)
    assert not flip.any()

    scaled = rot_H(0.5)
    scaled[:2, :2] *= 1.01                 # 1% scale: ~0.7 px at corners
    assert rotations_from_Hs(scaled[None], size) is None
    skew = np.eye(3)
    skew[0, 1] = 0.01                      # ~1 px skew at corners
    assert rotations_from_Hs(skew[None], size) is None
    persp = rot_H(0.5)
    persp[2, 0] = 2e-4                     # ~1.8 px at the far corner
    assert rotations_from_Hs(persp[None], size) is None
    assert rotations_from_Hs(rot_H(25.0)[None], size) is None
    # near-180° IS accepted (meridian flip factoring), 155° is not
    assert rotations_from_Hs(rot_H(179.2)[None], size) is not None
    assert rotations_from_Hs(rot_H(155.0)[None], size) is None
    # RANSAC-level noise (~3e-4 scale at 96 px) must PASS the gate
    noisy = rot_H(0.5)
    noisy[:2, :2] *= 1.0003
    assert rotations_from_Hs(noisy[None], size) is not None
    # identity IS a rotation (caught earlier by the translation path,
    # but must not be rejected here)
    assert rotations_from_Hs(np.eye(3)[None], size) is not None


def test_rotation_shear_warp_odd_dims_multichannel(rng):
    """Odd H/W (no clean FFT Nyquist bin) and C=3 channels through the
    shear warp, checked against analytic re-rendering; out-of-field
    masking must hold on the flipped (meridian) path too."""
    import jax.numpy as jnp

    from siril_tpu.ops.interp import (
        rotations_from_Hs,
        warp_rotation_batch,
    )

    H, W = 97, 85
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    stars = list(zip(rng.uniform(16, W - 16, 20),
                     rng.uniform(16, H - 16, 20),
                     rng.uniform(0.2, 0.9, 20)))

    def render(pts, gain):
        img = np.full((H, W), 0.08, np.float32)
        for x0, y0, a in pts:
            img += gain * a * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2)
                                     / (2 * 2.4 ** 2))
        return img

    def mk_H(theta_deg, tx, ty):
        th = np.deg2rad(theta_deg)
        c, s = np.cos(th), np.sin(th)
        cx, cy = (W - 1) / 2, (H - 1) / 2
        A = np.array([[c, -s], [s, c]])
        t = np.array([tx, ty]) + np.array([cx, cy]) - A @ [cx, cy]
        Hm = np.eye(3)
        Hm[:2, :2] = A
        Hm[:2, 2] = t
        return Hm

    frames = np.stack([np.stack([render(stars, g) for g in (1.0, 0.6,
                                                            0.3)])] * 2)
    Hs = np.stack([mk_H(1.1, -2.2, 1.4), mk_H(180.0 - 0.9, 2.0, 3.0)])
    rot = rotations_from_Hs(Hs, (H, W))
    assert rot is not None and list(rot[3]) == [False, True]
    out = np.asarray(warp_rotation_batch(jnp.asarray(frames), rot,
                                         clamp=False))
    I = np.s_[10:-10, 10:-10]
    for k in range(2):
        pts = [tuple((Hs[k] @ [x0, y0, 1])[:2]) + (a,)
               for x0, y0, a in stars]
        for c, g in enumerate((1.0, 0.6, 0.3)):
            gt = render(pts, g)
            assert np.abs(out[k, c][I] - gt[I]).max() < 2e-4, (k, c)
    # flip path: ty=+3 means the TOP rows' sources fall outside -> 0
    # (src_y = cy - (y-cy) - ty < 0 for the largest y after flip);
    # verify some masked pixels exist and masked pixels are exactly 0
    inv = np.linalg.inv(Hs[1])
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    src = np.einsum("ij,pj->pi", inv,
                    np.c_[gx.ravel(), gy.ravel(), np.ones(H * W)])
    src = src[:, :2] / src[:, 2:3]
    outside = ((src[:, 0] < 0) | (src[:, 0] > W - 1)
               | (src[:, 1] < 0) | (src[:, 1] > H - 1)).reshape(H, W)
    assert outside.any()
    assert np.abs(out[1, :, outside]).max() == 0.0


def test_affines_from_Hs_gates():
    """Perspective / out-of-band scale must NOT take the CZT affine
    path; scale/skew within the band (focal drift, similarity) must."""
    from siril_tpu.ops.interp import affines_from_Hs

    size = (96, 96)

    def aff_H(sx, sy, deg, shear=0.0):
        th = np.deg2rad(deg)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        Hm = np.eye(3)
        Hm[:2, :2] = R @ [[sx, shear], [0.0, sy]]
        return Hm

    # the family the ROTATION gate rejects is accepted here
    ok = affines_from_Hs(np.stack([aff_H(1.01, 0.99, 0.5, 0.004),
                                   aff_H(1.0, 1.0, -3.0)]), size)
    assert ok is not None and not ok[2].any()
    # near-180° similarity: flip-folded
    ok = affines_from_Hs(aff_H(1.02, 1.02, 179.0)[None], size)
    assert ok is not None and ok[2].all()
    # perspective ≥ max_err_px at the corners: rejected
    persp = aff_H(1.01, 0.99, 0.5)
    persp[2, 0] = 2e-4
    assert affines_from_Hs(persp[None], size) is None
    # scale outside the alias-free band: rejected (gather handles it)
    assert affines_from_Hs(aff_H(1.4, 1.0, 0.0)[None], size) is None
    assert affines_from_Hs(aff_H(1.0, 0.6, 0.0)[None], size) is None
    # NaN / singular guards
    assert affines_from_Hs(np.full((1, 3, 3), np.nan), size) is None
    sing = np.eye(3)
    sing[0, 0] = 0.0
    assert affines_from_Hs(sing[None], size) is None


def test_affine_czt_warp_matches_gather(rng):
    """The two-pass chirp-Z affine warp must reproduce the lanczos4
    gather warp (same pull-back semantics) to within the lanczos
    truncation error — CZT interpolates with exact sinc — including
    scale, skew, a meridian-flipped frame, and the validity mask."""
    import jax.numpy as jnp

    from siril_tpu.ops.interp import (
        affines_from_Hs,
        warp_affine_batch,
        warp_homography_batch,
    )

    H, W = 160, 192
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.full((H, W), 0.05, np.float32)
    for _ in range(20):
        x0 = rng.uniform(30, W - 30)
        y0 = rng.uniform(30, H - 30)
        a = rng.uniform(0.2, 0.6)
        img += a * np.exp(-(((xx - x0) ** 2 + (yy - y0) ** 2)
                            / (2 * 2.2 ** 2))).astype(np.float32)
    c = np.array([(W - 1) / 2, (H - 1) / 2])

    def mk_H(sx, sy, deg, shear, tx, ty):
        th = np.deg2rad(deg)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        A = R @ np.array([[sx, shear], [0.0, sy]])
        Hm = np.eye(3)
        Hm[:2, :2] = A
        Hm[:2, 2] = c - A @ c + [tx, ty]
        return Hm

    Hs = np.stack([mk_H(1.02, 0.985, 1.3, 0.004, 2.3, -1.7),
                   mk_H(0.99, 1.01, -0.8, -0.003, -1.1, 2.0),
                   mk_H(1.03, 1.015, 179.2, 0.002, 1.0, 3.0)])
    aff = affines_from_Hs(Hs, (H, W))
    assert aff is not None and list(aff[2]) == [False, False, True]
    frames = np.stack([img[None]] * 3)
    out = np.asarray(warp_affine_batch(jnp.asarray(frames), aff,
                                       clamp=False))
    ref = np.asarray(warp_homography_batch(jnp.asarray(frames), Hs,
                                           (H, W), clamp=False))
    I = np.s_[16:-16, 16:-16]
    for k in range(3):
        assert np.abs(out[k, 0]).sum() > 100.0          # not blank
        assert np.abs(out[k, 0][I] - ref[k, 0][I]).max() < 3e-3, k
    # validity mask: exactly 0 where the gather warp masks (borders)
    outside = ref[:, 0] == 0.0
    # the CZT path masks from the analytic map; allow gather's border
    # taps to differ, but every analytically-outside pixel must be 0
    inv = np.linalg.inv(Hs[0])
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    src = np.einsum("ij,pj->pi", inv,
                    np.c_[gx.ravel(), gy.ravel(), np.ones(H * W)])
    src = src[:, :2] / src[:, 2:3]
    om = ((src[:, 0] < 0) | (src[:, 0] > W - 1)
          | (src[:, 1] < 0) | (src[:, 1] > H - 1)).reshape(H, W)
    assert om.any() and np.abs(out[0, 0][om]).max() == 0.0

    # clamped variant (the pipeline default): close to the clamped
    # gather warp; mask patterns differ slightly between sinc/lanczos
    outc = np.asarray(warp_affine_batch(jnp.asarray(frames), aff,
                                        clamp=True))
    refc = np.asarray(warp_homography_batch(jnp.asarray(frames), Hs,
                                            (H, W), clamp=True))
    for k in range(3):
        assert np.abs(outc[k, 0][I] - refc[k, 0][I]).max() < 1e-2, k


def test_affine_czt_warp_odd_dims_multichannel(rng):
    """Odd H/W (fft edge cases) and 3 channels through the CZT path."""
    import jax.numpy as jnp

    from siril_tpu.ops.interp import (
        affines_from_Hs,
        warp_affine_batch,
        warp_homography_batch,
    )

    H, W = 131, 159
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    chans = []
    for g in (1.0, 0.6, 0.3):
        im = np.full((H, W), 0.04, np.float32)
        for _ in range(12):
            x0 = rng.uniform(20, W - 20)
            y0 = rng.uniform(20, H - 20)
            im += g * 0.5 * np.exp(-(((xx - x0) ** 2 + (yy - y0) ** 2)
                                     / (2 * 2.0 ** 2))).astype(np.float32)
        chans.append(im)
    img = np.stack(chans)
    c = np.array([(W - 1) / 2, (H - 1) / 2])

    def mk_H(sx, sy, deg, tx, ty):
        th = np.deg2rad(deg)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        A = R @ np.diag([sx, sy])
        Hm = np.eye(3)
        Hm[:2, :2] = A
        Hm[:2, 2] = c - A @ c + [tx, ty]
        return Hm

    Hs = np.stack([mk_H(1.015, 0.99, 1.1, -2.2, 1.4),
                   mk_H(1.02, 1.02, 180.0 - 0.9, 2.0, 3.0)])
    aff = affines_from_Hs(Hs, (H, W))
    assert aff is not None and list(aff[2]) == [False, True]
    frames = np.stack([img] * 2)
    out = np.asarray(warp_affine_batch(jnp.asarray(frames), aff,
                                       clamp=False))
    ref = np.asarray(warp_homography_batch(jnp.asarray(frames), Hs,
                                           (H, W), clamp=False))
    I = np.s_[12:-12, 12:-12]
    for k in range(2):
        for ch in range(3):
            assert np.abs(out[k, ch][I] - ref[k, ch][I]).max() < 3e-3, \
                (k, ch)


def test_perspective_split_gates():
    """perspective_split_from_Hs: accepts mild projective maps, rejects
    strong perspective (horizon near frame), out-of-band scale, and
    degenerate input."""
    from siril_tpu.ops.interp import perspective_split_from_Hs

    size = (160, 192)

    def pers_H(sx, sy, deg, g1, g2, tx=0.0, ty=0.0):
        th = np.deg2rad(deg)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        Hm = np.eye(3)
        Hm[:2, :2] = R @ np.diag([sx, sy])
        Hm[:2, 2] = [tx, ty]
        Hm[2, :2] = [g1, g2]
        return Hm

    ok = perspective_split_from_Hs(
        np.stack([pers_H(1.01, 0.99, 0.8, 2e-5, -1.5e-5, 2.0, -1.0),
                  pers_H(0.995, 1.005, -1.2, -1e-5, 2e-5)]), size)
    assert ok is not None
    M, b, flip, K, D = ok
    assert M.shape == (2, 2, 2) and K.shape == (2, 3, 3)
    assert D in (2, 4, 8, 16) and not flip.any()
    # strong perspective: horizon line crosses the frame
    assert perspective_split_from_Hs(
        pers_H(1.0, 1.0, 0.0, 0.02, 0.0)[None], size) is None
    # scale far out of the chirp-Z band
    assert perspective_split_from_Hs(
        pers_H(1.5, 1.0, 0.0, 1e-5, 0.0)[None], size) is None
    # degenerate / non-finite
    assert perspective_split_from_Hs(np.full((1, 3, 3), np.nan),
                                     size) is None
    sing = np.eye(3)
    sing[1, 1] = 0.0
    assert perspective_split_from_Hs(sing[None], size) is None
    # 180-fold perspective frame gets the flip fold
    okf = perspective_split_from_Hs(
        pers_H(1.0, 1.0, 179.3, 1e-5, -1e-5, 1.0, 2.0)[None], size)
    assert okf is not None and list(okf[2]) == [True]


def test_perspective_czt_warp_matches_gather(rng):
    """The affine-CZT + residual-shift perspective warp must reproduce
    the lanczos4 gather warp for genuinely projective registrations
    (mosaic tiles / astrometric H) within lanczos truncation error,
    and mask every analytically-outside pixel."""
    import jax.numpy as jnp

    from siril_tpu.ops.interp import (
        affines_from_Hs,
        perspective_split_from_Hs,
        warp_homography_batch,
        warp_perspective_batch,
    )

    H, W = 160, 192
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.full((H, W), 0.05, np.float32)
    for _ in range(20):
        x0 = rng.uniform(30, W - 30)
        y0 = rng.uniform(30, H - 30)
        a = rng.uniform(0.2, 0.6)
        img += a * np.exp(-(((xx - x0) ** 2 + (yy - y0) ** 2)
                            / (2 * 2.2 ** 2))).astype(np.float32)
    c = np.array([(W - 1) / 2, (H - 1) / 2])

    def mk_H(sx, sy, deg, shear, tx, ty, g1, g2):
        th = np.deg2rad(deg)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        A = R @ np.array([[sx, shear], [0.0, sy]])
        Hm = np.eye(3)
        Hm[:2, :2] = A
        Hm[:2, 2] = c - A @ c + [tx, ty]
        Hm[2, :2] = [g1, g2]
        return Hm

    Hs = np.stack([
        mk_H(1.015, 0.99, 1.1, 0.003, 2.3, -1.7, 2e-5, -1.2e-5),
        mk_H(0.99, 1.008, -0.9, -0.002, -1.1, 2.0, -1.5e-5, 1e-5),
        mk_H(1.01, 1.02, 179.4, 0.002, 1.0, 3.0, 1e-5, 1.8e-5),
    ])
    # genuinely projective: the affine family gate must refuse these
    assert affines_from_Hs(Hs, (H, W)) is None
    persp = perspective_split_from_Hs(Hs, (H, W))
    assert persp is not None and list(persp[2]) == [False, False, True]

    frames = np.stack([img[None]] * 3)
    out = np.asarray(warp_perspective_batch(jnp.asarray(frames), persp,
                                            clamp=False))
    ref = np.asarray(warp_homography_batch(jnp.asarray(frames), Hs,
                                           (H, W), clamp=False))
    D = int(persp[4])
    pad = 16 + D
    I = np.s_[pad:-pad, pad:-pad]
    for k in range(3):
        assert np.abs(out[k, 0]).sum() > 100.0          # not blank
        assert np.abs(out[k, 0][I] - ref[k, 0][I]).max() < 5e-3, k
    # validity: every analytically-outside pixel is exactly 0
    inv = np.linalg.inv(Hs[0])
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    src = np.einsum("ij,pj->pi", inv,
                    np.c_[gx.ravel(), gy.ravel(), np.ones(H * W)])
    src = src[:, :2] / src[:, 2:3]
    om = ((src[:, 0] < 0) | (src[:, 0] > W - 1)
          | (src[:, 1] < 0) | (src[:, 1] > H - 1)).reshape(H, W)
    assert om.any() and np.abs(out[0, 0][om]).max() == 0.0

    # clamped variant (pipeline default) close to the clamped gather
    outc = np.asarray(warp_perspective_batch(jnp.asarray(frames), persp,
                                             clamp=True))
    refc = np.asarray(warp_homography_batch(jnp.asarray(frames), Hs,
                                            (H, W), clamp=True))
    for k in range(3):
        assert np.abs(outc[k, 0][I] - refc[k, 0][I]).max() < 1e-2, k


def test_perspective_split_gate_regressions():
    """Gate details: scale-equivalent Hs accepted (det gate runs on the
    normalized maps), per-frame horizon proximity, and max_D beyond the
    largest bucket returns params/None instead of raising."""
    from siril_tpu.ops.interp import perspective_split_from_Hs

    size = (160, 192)

    def pers_H(sx, sy, deg, g1, g2, tx=0.0, ty=0.0):
        th = np.deg2rad(deg)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        Hm = np.eye(3)
        Hm[:2, :2] = R @ np.diag([sx, sy])
        Hm[:2, 2] = [tx, ty]
        Hm[2, :2] = [g1, g2]
        return Hm

    base = np.stack([pers_H(1.01, 0.99, 0.8, 2e-5, -1.5e-5, 2.0, -1.0),
                     pers_H(0.995, 1.005, -1.2, -1e-5, 2e-5)])
    ok = perspective_split_from_Hs(base, size)
    assert ok is not None
    # homographies are scale-equivalent: a uniformly scaled-down batch
    # must produce the same split (det gate on the NORMALIZED maps)
    oks = perspective_split_from_Hs(base * 1e-3, size)
    assert oks is not None
    np.testing.assert_allclose(oks[0], ok[0], atol=1e-12)
    np.testing.assert_allclose(oks[3], ok[3], atol=1e-9)
    # a large caller max_D must not raise past the biggest bucket
    got = perspective_split_from_Hs(base, size, max_D=64)
    assert got is not None and got[4] in (2, 4, 8, 16)
    # one frame with a large third-row scale must not raise the horizon
    # proximity threshold for healthy frames (per-frame max rule):
    # frame 2 has |g| 20x frame 1's but both are individually fine
    mixed = np.stack([pers_H(1.0, 1.0, 0.0, 1e-6, 0.0),
                      pers_H(1.0, 1.0, 0.0, 2e-5, -1e-5)])
    assert perspective_split_from_Hs(mixed, size) is not None


def test_perspective_czt_clamp_suppresses_ringing(rng):
    """The perspective path's ringing clamp must suppress sinc lobes
    around a point source — its guide is a bilinear gather of the
    ORIGINAL frames, so it cannot inherit the CZT passes' ringing."""
    import jax.numpy as jnp

    from siril_tpu.ops.interp import (
        perspective_split_from_Hs,
        warp_perspective_batch,
    )

    H, W = 160, 192
    c = np.array([(W - 1) / 2, (H - 1) / 2])
    th = np.deg2rad(1.0)
    A = 1.01 * np.array([[np.cos(th), -np.sin(th)],
                         [np.sin(th), np.cos(th)]])
    Hm = np.eye(3)
    Hm[:2, :2] = A
    Hm[:2, 2] = c - A @ c + [1.7, -2.3]
    Hm[2, :2] = [2e-5, -1.5e-5]
    persp = perspective_split_from_Hs(Hm[None], (H, W))
    assert persp is not None

    hot = np.zeros((1, 1, H, W), np.float32)
    hot[0, 0, H // 2, W // 2] = 1.0       # sub-sinc-width point source
    ring = np.asarray(warp_perspective_batch(jnp.asarray(hot), persp,
                                             clamp=False))[0, 0]
    ringc = np.asarray(warp_perspective_batch(jnp.asarray(hot), persp,
                                              clamp=True))[0, 0]
    assert ring.min() < -0.05             # sinc rings hard on a delta
    assert ringc.min() > 0.5 * ring.min()  # clamp suppresses the lobes
