"""Real .icc file support: binary parse/write round-trip, Bradford
adaptation, conversion through file profiles, FITS embedding
(core/icc_profile.c + image_format_fits.c:931 equivalents)."""

import numpy as np
import pytest

from siril_tpu.core.image import SirilImage
from siril_tpu.ops import icc
from siril_tpu.ops import icc_file as icf


def test_srgb_profile_roundtrip(tmp_path):
    prof = icf.srgb_profile()
    p = str(tmp_path / "srgb.icc")
    icf.write_icc(prof, p)
    back = icf.read_icc(p)
    assert back.description == prof.description
    np.testing.assert_allclose(back.matrix, prof.matrix, atol=2e-5)
    assert back.trc["r"].kind == "para"
    x = np.linspace(0, 1, 64)
    np.testing.assert_allclose(back.trc["g"].decode(x),
                               prof.trc["g"].decode(x), atol=1e-4)


def test_parametric_srgb_matches_analytic():
    """para type 3 with sRGB constants == the analytic sRGB EOTF."""
    t = icf.srgb_profile().trc["r"]
    x = np.linspace(0, 1, 257)
    want = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
    np.testing.assert_allclose(t.decode(x), want, atol=1e-6)
    # encode inverts decode
    np.testing.assert_allclose(t.encode(t.decode(x)), x, atol=1e-3)


def test_curv_table_roundtrip(tmp_path):
    table = np.linspace(0, 1, 256) ** 2.2
    prof = icf.IccProfile(description="tbl", matrix=np.eye(3),
                          trc={c: icf.Trc("table", table=table)
                               for c in "rgb"})
    p = str(tmp_path / "t.icc")
    icf.write_icc(prof, p)
    back = icf.read_icc(p)
    x = np.linspace(0, 1, 100)
    np.testing.assert_allclose(back.trc["b"].decode(x),
                               np.interp(x, np.linspace(0, 1, 256), table),
                               atol=2e-4)


def test_bradford_adaptation_roundtrip():
    m = np.random.default_rng(0).random((3, 3))
    m2 = icf.bradford_adapt(icf.bradford_adapt(m, icf._D65, icf._D50),
                            icf._D50, icf._D65)
    np.testing.assert_allclose(m2, m, atol=1e-12)


def test_assign_real_icc_file(tmp_path):
    p = str(tmp_path / "p.icc")
    icf.write_icc(icf.srgb_profile(), p)
    img = SirilImage(data=np.full((3, 8, 8), 0.5, np.float32))
    out = icc.assign_profile(img, p)
    assert out.icc_profile is not None
    assert out.keywords.extra["ICCPROF"] == "sRGB (siril_tpu)"
    # pixels untouched by assign
    np.testing.assert_array_equal(out.host(), img.host())


def test_convert_via_file_profile_identity(tmp_path):
    """sRGB (builtin) → sRGB (.icc file) must be a no-op within noise."""
    p = str(tmp_path / "srgb.icc")
    icf.write_icc(icf.srgb_profile(), p)
    rng = np.random.default_rng(2)
    img = SirilImage(data=rng.random((3, 16, 16)).astype(np.float32))
    img.keywords.extra["ICCPROF"] = "sRGB"
    out = icc.convert_to_profile(img, p)
    np.testing.assert_allclose(out.host(), img.host(), atol=2e-3)


def test_fits_embeds_icc(tmp_path):
    from siril_tpu.io.fits_io import read_fits, write_fits

    img = SirilImage(data=np.full((3, 12, 12), 0.3, np.float32))
    img2 = icc.assign_profile(img, "srgb")
    assert img2.icc_profile is not None
    p = str(tmp_path / "with_icc.fit")
    write_fits(img2, p, bitdepth=-32)
    back = read_fits(p)
    assert back.icc_profile == img2.icc_profile
    # the embedded bytes are a valid ICC profile
    prof = icf.read_icc_bytes(back.icc_profile)
    assert prof.matrix is not None
    np.testing.assert_array_equal(back.host(), img2.host())


def test_icc_assign_command(tmp_path):
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line

    p = tmp_path / "x.icc"
    icf.write_icc(icf.srgb_profile(), str(p))
    ctx = Session(cwd=str(tmp_path))
    ctx.set_image(SirilImage(data=np.full((3, 8, 8), 0.4, np.float32)))
    rc = process_command_line(ctx, "icc_assign x.icc")
    assert rc == 0
    assert ctx.image.icc_profile is not None


def test_mono_image_with_rgb_profile_roundtrip():
    """A mono image assigned an RGB profile converts without error
    (r-curve used as the gray fallback)."""
    import numpy as np

    from siril_tpu.core.image import SirilImage
    from siril_tpu.ops.icc import assign_profile, convert_to_profile

    rng = np.random.default_rng(1)
    img = SirilImage(data=rng.random((1, 8, 8)).astype(np.float32))
    a = assign_profile(img, "srgb")
    lin = convert_to_profile(a, "srgblinear")
    back = convert_to_profile(lin, "srgb")
    np.testing.assert_allclose(back.host(), a.host(), atol=2e-4)
