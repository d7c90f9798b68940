"""Drizzle tests: flux conservation, resolution recovery from dithered
frames, Bayer drizzle color recovery."""

import numpy as np
import pytest

from siril_tpu.core.image import SirilImage
from siril_tpu.ops.drizzle import (
    KERNEL_POINT,
    KERNEL_SQUARE,
    DrizzleAccumulator,
    DrizzleArgs,
)


def shift_H(dx, dy):
    H = np.eye(3)
    H[0, 2] = dx
    H[1, 2] = dy
    return H


class TestDrizzleBasics:
    def test_identity_scale1(self, rng):
        data = rng.random((1, 32, 32)).astype(np.float32)
        img = SirilImage(data=data)
        acc = DrizzleAccumulator((1, 32, 32),
                                 DrizzleArgs(scale=1.0, pixfrac=1.0))
        acc.add_frame(img, np.eye(3))
        out, wmap = acc.finalize()
        np.testing.assert_allclose(out.host()[0][1:-1, 1:-1],
                                   data[0][1:-1, 1:-1], atol=1e-5)
        np.testing.assert_allclose(wmap.host()[0][1:-1, 1:-1], 1.0, atol=1e-5)

    def test_mean_preserved_at_scale2(self, rng):
        data = rng.random((1, 32, 32)).astype(np.float32)
        img = SirilImage(data=data)
        acc = DrizzleAccumulator((1, 64, 64), DrizzleArgs(scale=2.0))
        acc.add_frame(img, np.eye(3))
        out, _ = acc.finalize()
        # surface brightness (mean) preserved under drizzle
        assert out.host().mean() == pytest.approx(data.mean(), rel=0.02)

    def test_dithered_frames_fill_grid(self, rng):
        """4 frames with half-pixel dithers at pixfrac 0.5 fill a 2×
        grid completely."""
        base = rng.random((1, 24, 24)).astype(np.float32)
        acc = DrizzleAccumulator((1, 48, 48),
                                 DrizzleArgs(scale=2.0, pixfrac=0.5))
        for (dx, dy) in [(0, 0), (0.5, 0), (0, 0.5), (0.5, 0.5)]:
            img = SirilImage(data=base)     # same content; sub-px reg shift
            acc.add_frame(img, shift_H(dx, dy))
        out, wmap = acc.finalize()
        w = wmap.host()[0][4:-4, 4:-4]
        assert (w > 0.05).all(), "holes in drizzle coverage"

    def test_point_kernel(self, rng):
        data = np.zeros((1, 16, 16), np.float32)
        data[0, 8, 8] = 1.0
        acc = DrizzleAccumulator((1, 32, 32),
                                 DrizzleArgs(scale=2.0, kernel=KERNEL_POINT))
        acc.add_frame(SirilImage(data=data), np.eye(3))
        out, _ = acc.finalize()
        o = out.host()[0]
        # the impulse lands in the 2×2 output block of input pixel (8,8)
        assert o[16:18, 16:18].max() == pytest.approx(1.0, abs=1e-5)
        assert o.sum() <= 4.0 + 1e-3


class TestBayerDrizzle:
    def test_color_recovery(self, rng):
        # flat color CFA frames with dithers → drizzle recovers channels
        h = w = 32
        rgb = (0.6, 0.4, 0.2)
        from siril_tpu.ops.demosaic import _cfa_masks

        rm, gm, bm = _cfa_masks("RGGB", h, w)
        cfa = np.zeros((h, w), np.float32)
        cfa[rm], cfa[gm], cfa[bm] = rgb[0], rgb[1], rgb[2]
        acc = DrizzleAccumulator((3, h, w),
                                 DrizzleArgs(scale=1.0, pixfrac=1.0,
                                             use_bayer=True))
        # dithered exposures of a FLAT scene: the recorded CFA frames are
        # identical (sensor pattern is fixed); only the registration
        # shift differs — drizzle must still fill every channel plane
        for (dx, dy) in [(0, 0), (1, 0), (0, 1), (1, 1)]:
            img = SirilImage(data=cfa[None].copy())
            img.keywords.bayer_pattern = "RGGB"
            acc.add_frame(img, shift_H(dx, dy))
        out, wmap = acc.finalize()
        o = out.host()[:, 4:-4, 4:-4]
        np.testing.assert_allclose(o[0], rgb[0], atol=0.01)
        np.testing.assert_allclose(o[1], rgb[1], atol=0.01)
        np.testing.assert_allclose(o[2], rgb[2], atol=0.01)
        # full coverage on every channel thanks to the 4 dithers
        assert (wmap.host()[:, 4:-4, 4:-4] > 0.1).all()


def test_chunked_sequence_matches_per_frame(tmp_path):
    """drizzle_sequence (chunk-batched scan accumulate, u16 fast path)
    equals the per-frame add_frame accumulation."""
    from siril_tpu.cli.context import Session
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.demosaic import _cfa_masks
    from siril_tpu.ops.drizzle import drizzle_sequence

    rng = np.random.default_rng(5)
    h, w = 24, 32
    rm, gm, bm = _cfa_masks("RGGB", h, w)
    imgs = []
    for i in range(5):
        cfa = rng.uniform(0.1, 0.6, (h, w)).astype(np.float32)
        img = SirilImage(data=cfa[None])
        img.keywords.bayer_pattern = "RGGB"
        imgs.append(img)
        write_fits(img, str(tmp_path / f"dc_{i + 1:05d}.fit"),
                   bitdepth=16)
    ctx = Session(cwd=str(tmp_path))
    seq = ctx.load_sequence("dc_")
    seq.nb_layers = 1
    reg = seq.reg(0)
    Hs = [shift_H(0.3 * k, -0.2 * k) for k in range(5)]
    for k in range(5):
        reg.H[k] = Hs[k]
        reg.valid[k] = True
    seq.save()
    args = DrizzleArgs(scale=2.0, pixfrac=0.8, use_bayer=True)
    out, wmap = drizzle_sequence(seq, args, frame_chunk=2)

    ref_acc = DrizzleAccumulator((3, 2 * h, 2 * w), args)
    for k in range(5):
        # round-trip through the u16 FITS quantization like the reader
        img = seq.read_frame(k)
        ref_acc.add_frame(img, Hs[k])
    ref, ref_w = ref_acc.finalize()
    np.testing.assert_allclose(out.host(), ref.host(), atol=2e-5)
    np.testing.assert_allclose(wmap.host(), ref_w.host(), atol=2e-5)


def test_seqapplyreg_drizzle_outputs_sequence(tmp_path):
    """seqapplyreg -drizzle writes a per-frame drizzled sequence
    (applyreg.c drizzle path), not a combined stack."""
    from siril_tpu.cli.commands import COMMANDS
    from siril_tpu.cli.context import Session
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(23)
    for i in range(3):
        write_fits(SirilImage(data=rng.uniform(0.1, 0.5, (1, 24, 32))
                              .astype(np.float32)),
                   str(tmp_path / f"dz_{i + 1:05d}.fit"), bitdepth=16)
    ctx = Session(cwd=str(tmp_path))
    seq = ctx.load_sequence("dz_")
    seq.nb_layers = 1
    reg = seq.reg(0)
    for k in range(3):
        reg.H[k] = np.eye(3)
        reg.valid[k] = True
    seq.save()
    COMMANDS["seqapplyreg"].fn(ctx, ["dz_", "-drizzle", "-scale=2"])
    out = ctx.seq
    assert out.number == 3
    f0 = out.read_frame(0)
    assert f0.width == 64 and f0.height == 48
