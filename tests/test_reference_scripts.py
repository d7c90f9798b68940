"""Run the reference's shipped .ssf preprocessing script VERBATIM against
synthetic data — the strongest script-compatibility evidence we can
produce offline.  The script file is read from the read-only reference
mount at test time (never copied into this repo); skipped when absent.
"""

import os

import numpy as np
import pytest

from siril_tpu.cli.context import Session
from siril_tpu.cli.parser import execute_script
from siril_tpu.core.image import SirilImage
from siril_tpu.io.fits_io import read_fits, write_fits

SCRIPT = "/root/reference/scripts/Mono_Preprocessing.ssf"


@pytest.mark.skipif(not os.path.exists(SCRIPT),
                    reason="reference scripts not mounted")
def test_mono_preprocessing_script_verbatim(tmp_path):
    rng = np.random.default_rng(55)
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w]

    bias_level = 0.05
    dark_current = 0.02
    flat = 1.0 - 0.3 * (((xx - w / 2) ** 2 + (yy - h / 2) ** 2)
                        / (w * w / 2)).astype(np.float32)   # vignette
    scene = 0.02 + rng.normal(0, 0.001, (h, w)).astype(np.float32)
    for _ in range(25):
        x0 = rng.uniform(24, w - 24)
        y0 = rng.uniform(24, h - 24)
        scene += rng.uniform(0.3, 0.6) * np.exp(-(((xx + 0.5 - x0) ** 2 +
                                 (yy + 0.5 - y0) ** 2) / (2 * 2.0 ** 2)))
    scene = np.clip(scene, 0, 0.8)

    def save(dirname, name, i, data, exposure):
        d = tmp_path / dirname
        d.mkdir(exist_ok=True)
        img = SirilImage(data=np.clip(data, 1e-4, 1)[None]
                         .astype(np.float32))
        img.keywords.exposure = exposure
        img.keywords.extra["FILTER"] = "L"
        write_fits(img, str(d / f"{name}_{i:03d}.fit"), bitdepth=16)

    nois = lambda s: rng.normal(0, s, (h, w)).astype(np.float32)
    for i in range(4):
        save("biases", "b", i, bias_level + nois(0.002), 0.001)
        save("darks", "d", i, bias_level + dark_current + nois(0.003), 30.0)
        save("flats", "f", i, bias_level + 0.5 * flat + nois(0.003), 2.0)
        dx, dy = [(0, 0), (2, 1), (-1, 2), (1, -2)][i]
        shifted = np.roll(np.roll(scene, dy, 0), dx, 1)
        save("lights", "l", i,
             bias_level + dark_current + shifted * flat + nois(0.003), 30.0)
    (tmp_path / "masters").mkdir()
    (tmp_path / "process").mkdir()

    ctx = Session(cwd=str(tmp_path))
    rc = execute_script(ctx, SCRIPT)
    assert rc == 0, "reference script aborted"

    # masters + final result exist
    assert os.path.exists(tmp_path / "masters" / "bias_stacked.fit")
    assert os.path.exists(tmp_path / "masters" / "dark_stacked.fit")
    assert os.path.exists(tmp_path / "masters" / "pp_flat_stacked.fit")
    results = [f for f in os.listdir(tmp_path)
               if f.startswith("result_") and f.endswith(".fit")]
    assert results, "no path-parsed result_$FILTER$_$LIVETIME$s file"
    # path parsing resolved FILTER and LIVETIME (4 lights × 30 s)
    assert "result_L_120s.fit" in results

    out = read_fits(str(tmp_path / results[0])).host()[0]
    # -output_norm rescales; compare structure: star positions must match
    # the (mirrored) scene — mirrorx -bottomup flips vertically
    ref = scene[::-1]
    interior = np.s_[10:-10, 10:-10]
    corr = np.corrcoef(out[interior].ravel(), ref[interior].ravel())[0, 1]
    assert corr > 0.98, f"stacked result decorrelated from scene ({corr})"


OSC_SCRIPT = "/root/reference/scripts/OSC_Preprocessing.ssf"
DRIZZLE_SCRIPT = "/root/reference/scripts/OSC_Preprocessing_BayerDrizzle.ssf"
HA_SCRIPT = "/root/reference/scripts/OSC_Extract_Ha.ssf"


def _make_osc_fixture(tmp_path, rng, h=128, nstars=25, sigma=2.0):
    w = h
    yy, xx = np.mgrid[0:h, 0:w]
    bias_level = 0.05
    dark_current = 0.02
    flat = 1.0 - 0.25 * (((xx - w / 2) ** 2 + (yy - h / 2) ** 2)
                         / (w * w / 2)).astype(np.float32)
    # RGB scene → RGGB mosaic
    rgb = np.zeros((3, h, w), np.float32)
    rgb += 0.02
    for _ in range(nstars):
        x0 = rng.uniform(24, w - 24)
        y0 = rng.uniform(24, h - 24)
        a = rng.uniform(0.3, 0.6)
        g = a * np.exp(-(((xx + 0.5 - x0) ** 2 +
                          (yy + 0.5 - y0) ** 2) / (2 * sigma ** 2)))
        col = rng.uniform(0.7, 1.0, 3)
        rgb += col[:, None, None] * g
    rgb = np.clip(rgb, 0, 0.8)
    mosaic = np.zeros((h, w), np.float32)
    mosaic[0::2, 0::2] = rgb[0, 0::2, 0::2]
    mosaic[0::2, 1::2] = rgb[1, 0::2, 1::2]
    mosaic[1::2, 0::2] = rgb[1, 1::2, 0::2]
    mosaic[1::2, 1::2] = rgb[2, 1::2, 1::2]

    def save(dirname, name, i, data, exposure):
        d = tmp_path / dirname
        d.mkdir(exist_ok=True)
        img = SirilImage(data=np.clip(data, 1e-4, 1)[None]
                         .astype(np.float32))
        img.keywords.exposure = exposure
        img.keywords.bayer_pattern = "RGGB"
        write_fits(img, str(d / f"{name}_{i:03d}.fit"), bitdepth=16)

    nois = lambda s: rng.normal(0, s, (h, w)).astype(np.float32)
    for i in range(4):
        save("biases", "b", i, bias_level + nois(0.002), 0.001)
        save("darks", "d", i, bias_level + dark_current + nois(0.003), 30.0)
        save("flats", "f", i, bias_level + 0.5 * flat + nois(0.003), 2.0)
        dx, dy = [(0, 0), (2, 2), (-2, 2), (2, -2)][i]   # even shifts (CFA)
        shifted = np.roll(np.roll(mosaic, dy, 0), dx, 1)
        save("lights", "l", i,
             bias_level + dark_current + shifted * flat + nois(0.003), 30.0)
    (tmp_path / "masters").mkdir()
    (tmp_path / "process").mkdir()
    return rgb


@pytest.mark.skipif(not os.path.exists(OSC_SCRIPT),
                    reason="reference scripts not mounted")
def test_osc_preprocessing_script_verbatim(tmp_path):
    """The OSC (Bayer) preprocessing script verbatim: CFA calibration
    with -cfa -equalize_cfa -debayer, registration on debayered lights,
    rgb_equal stack."""
    rgb = _make_osc_fixture(tmp_path, np.random.default_rng(56))
    ctx = Session(cwd=str(tmp_path))
    rc = execute_script(ctx, OSC_SCRIPT)
    assert rc == 0, "OSC reference script aborted"
    results = [f for f in os.listdir(tmp_path)
               if f.startswith("result_") and f.endswith(".fit")]
    assert "result_120s.fit" in results
    out = read_fits(str(tmp_path / "result_120s.fit"))
    assert out.nchans == 3                     # debayered RGB output
    g = out.host()[1][::-1]                    # mirrored back
    interior = np.s_[10:-10, 10:-10]
    corr = np.corrcoef(g[interior].ravel(),
                       rgb[1][interior].ravel())[0, 1]
    assert corr > 0.9, f"green channel decorrelated ({corr})"


@pytest.mark.skipif(not os.path.exists(DRIZZLE_SCRIPT),
                    reason="reference scripts not mounted")
def test_osc_bayer_drizzle_script_verbatim(tmp_path):
    """Bayer-drizzle preprocessing verbatim: register -drizzle with the
    master flat as weight plane, then stack the drizzled sequence."""
    rgb = _make_osc_fixture(tmp_path, np.random.default_rng(57))
    ctx = Session(cwd=str(tmp_path))
    rc = execute_script(ctx, DRIZZLE_SCRIPT)
    assert rc == 0, "BayerDrizzle reference script aborted"
    results = [f for f in os.listdir(tmp_path)
               if f.startswith("result_drizzle") and f.endswith(".fit")]
    assert results
    out = read_fits(str(tmp_path / results[0]))
    assert out.nchans == 3                 # Bayer-drizzled to RGB
    g = out.host()[1][::-1]
    interior = np.s_[10:-10, 10:-10]
    corr = np.corrcoef(g[interior].ravel(),
                       rgb[1][interior].ravel())[0, 1]
    assert corr > 0.85, f"drizzled green decorrelated ({corr})"


@pytest.mark.skipif(not os.path.exists(HA_SCRIPT),
                    reason="reference scripts not mounted")
def test_osc_extract_ha_script_verbatim(tmp_path):
    """Ha extraction workflow verbatim: CFA calibrate, seqextract_Ha
    -upscale, register, stack."""
    rgb = _make_osc_fixture(tmp_path, np.random.default_rng(58))
    ctx = Session(cwd=str(tmp_path))
    rc = execute_script(ctx, HA_SCRIPT)
    assert rc == 0, "Extract_Ha reference script aborted"
    results = [f for f in os.listdir(tmp_path)
               if f.startswith("result_Ha") and f.endswith(".fit")]
    assert results
    out = read_fits(str(tmp_path / results[0]))
    assert out.nchans == 1                 # Ha is a mono extraction


RGB_SCRIPT = "/root/reference/scripts/RGB_Composition.ssf"


@pytest.mark.skipif(not os.path.exists(RGB_SCRIPT),
                    reason="reference scripts not mounted")
def test_rgb_composition_script_verbatim(tmp_path):
    """RGB composition verbatim: 2-pass register 3 mono frames,
    min-framing apply, rgbcomp."""
    rng = np.random.default_rng(59)
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.03 + rng.normal(0, 0.002, (h, w)).astype(np.float32)
    for _ in range(20):
        x0 = rng.uniform(24, w - 24)
        y0 = rng.uniform(24, h - 24)
        base += rng.uniform(0.3, 0.6) * np.exp(
            -(((xx + 0.5 - x0) ** 2 + (yy + 0.5 - y0) ** 2) / 8.0))
    base = np.clip(base, 0, 1)
    for i, (dx, dy) in enumerate([(0, 0), (3, -2), (-2, 3)], start=1):
        f = np.roll(np.roll(base, dy, 0), dx, 1) \
            + rng.normal(0, 0.002, (h, w)).astype(np.float32)
        write_fits(SirilImage(data=np.clip(f, 0, 1)[None]),
                   str(tmp_path / f"chan_{i}.fit"), bitdepth=16)
    ctx = Session(cwd=str(tmp_path))
    rc = execute_script(ctx, RGB_SCRIPT)
    assert rc == 0, "RGB composition script aborted"
    out = read_fits(str(tmp_path / "rgb.fit"))
    assert out.nchans == 3
    d = out.host()
    interior = np.s_[12:-12, 12:-12]
    # channels aligned: R vs B difference small in the interior
    assert np.abs(d[0][interior] - d[2][interior]).mean() < 0.01


HAOIII_SCRIPT = "/root/reference/scripts/OSC_Extract_HaOIII.ssf"


@pytest.mark.skipif(not os.path.exists(HAOIII_SCRIPT),
                    reason="reference scripts not mounted")
def test_osc_extract_haoiii_script_verbatim(tmp_path):
    """The dual-band extraction script verbatim: HaOIII split, separate
    registrations and stacks, mirrorx_single on files, cross-band pm
    normalization with mad()/median()."""
    _make_osc_fixture(tmp_path, np.random.default_rng(60), h=256,
                      nstars=30, sigma=3.0)
    (tmp_path / "results").mkdir()
    ctx = Session(cwd=str(tmp_path))
    rc = execute_script(ctx, HAOIII_SCRIPT)
    assert rc == 0, "Extract_HaOIII reference script aborted"
    outs = os.listdir(tmp_path / "results")
    assert any(f.startswith("result_Ha") for f in outs)
    assert any(f.startswith("result_OIII") for f in outs)
