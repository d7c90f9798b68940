"""NL-Bayes denoiser tests (ops/nlbayes.py — filters/nlbayes equivalent)."""

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.ops.nlbayes import estimate_noise_sigma, nlbayes_denoise


def make_noisy(rng, sigma=0.04, n=96):
    yy, xx = np.mgrid[0:n, 0:n]
    clean = 0.3 + 0.25 * np.sin(xx / 8.0) * np.cos(yy / 11.0)
    clean[n // 2 - 8:n // 2 + 8, n // 2 - 8:n // 2 + 8] += 0.2
    noisy = np.clip(clean + rng.normal(0, sigma, clean.shape), 0, 1)
    return clean, noisy.astype(np.float32)


def test_noise_sigma_estimator():
    rng = np.random.default_rng(8)
    for sigma in (0.01, 0.05):
        _, noisy = make_noisy(rng, sigma, 128)
        est = estimate_noise_sigma(noisy)
        assert abs(est - sigma) < 0.35 * sigma


def test_nlbayes_reduces_error_preserves_edges():
    rng = np.random.default_rng(5)
    clean, noisy = make_noisy(rng)
    out = nlbayes_denoise(SirilImage(data=noisy[None])).host()[0]
    e_in = np.abs(noisy - clean).mean()
    e_out = np.abs(out - clean).mean()
    assert e_out < 0.5 * e_in
    # the block edge must survive
    assert np.abs(np.diff(out[48, 30:70])).max() > 0.05


def test_nlbayes_vst_and_sos_run():
    rng = np.random.default_rng(6)
    clean, noisy = make_noisy(rng, 0.03, 64)
    img = SirilImage(data=noisy[None])
    out1 = nlbayes_denoise(img, use_vst=True).host()[0]
    out2 = nlbayes_denoise(img, sos_iters=1).host()[0]
    for out in (out1, out2):
        assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean()


def test_denoise_command_flags(tmp_path):
    from siril_tpu.cli.commands import COMMANDS
    from siril_tpu.cli.context import Session

    rng = np.random.default_rng(7)
    clean, noisy = make_noisy(rng, 0.04, 64)
    ctx = Session(cwd=str(tmp_path))
    ctx.set_image(SirilImage(data=noisy[None]), "n")
    COMMANDS["denoise"].fn(ctx, ["-mod=0.5"])
    out = ctx.image.host()[0]
    # mod=0.5 blends halfway: error between full denoise and noisy
    assert np.abs(out - noisy).mean() > 1e-4
    assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean()
