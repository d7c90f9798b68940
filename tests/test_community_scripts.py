"""Community-script end-to-end: unmodified ``sirilpy``-based user
scripts, distributed through a (fixture) script repository synced with
``utils/scriptrepo.sync_repository``, executed through the real
``pyscript`` command — the full user path of the reference's scripts
menu (siril_pythonmodule.c:7729 venv spawn + gitscripts sync,
siril_git.c:215).

The scripts below are written in the style of the siril-scripts
community repository (connect → guard → cmd/pixeldata → log →
disconnect); the repo itself cannot be fetched here (no network
egress), so a local git fixture stands in for gitlab.com/free-astro/
siril-scripts.  They run UNMODIFIED through the reference sirilpy
client package against our wire server.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from siril_tpu.cli.context import Session
from siril_tpu.cli.parser import process_command_line
from siril_tpu.core.image import SirilImage
from siril_tpu.io.fits_io import write_fits
from siril_tpu.utils.scriptrepo import list_scripts, sync_repository

REF_PYMOD = "/root/reference/python_module"

INVERT_SCRIPT = '''\
# Invert.py — minimal community pattern: connect, guard, command, log.
import sys
import sirilpy as s

siril = s.SirilInterface()
siril.connect()
if not siril.is_image_loaded():
    siril.log_error("No image loaded")
    sys.exit(1)
siril.cmd("neg")
siril.log("Image inverted")
siril.disconnect()
'''

PIXELMATH_SCRIPT = '''\
# HalfFlux.py — SHM pixel round-trip pattern used by processing scripts
# (get pixels -> numpy -> set pixels).
import sys
import numpy as np
import sirilpy as s

siril = s.SirilInterface()
siril.connect()
if not siril.is_image_loaded():
    siril.log_error("No image loaded")
    sys.exit(1)
px = siril.get_image_pixeldata()
px = (px * 0.5).astype(np.float32)
siril.set_image_pixeldata(px)
st = siril.get_image_stats(0)
siril.log(f"halved; new median {st.median:.4f}")
siril.disconnect()
'''

STACK_SCRIPT = '''\
# QuickStack.py — sequence-processing pattern: drive commands in the
# working directory, then load the result.
import sys
import sirilpy as s

siril = s.SirilInterface()
siril.connect()
wd = siril.get_siril_wd()
siril.log(f"stacking in {wd}")
siril.cmd("stack", "li_", "rej", "w", "3", "3", "-nonorm",
          "-out=qstacked")
siril.cmd("load", "qstacked")
if not siril.is_image_loaded():
    siril.log_error("stack failed")
    sys.exit(1)
siril.log("QuickStack done")
siril.disconnect()
'''


def _have_git():
    try:
        subprocess.run(["git", "--version"], capture_output=True,
                       check=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _require_sirilpy():
    if not os.path.isdir(os.path.join(REF_PYMOD, "sirilpy")):
        pytest.skip("reference sirilpy not available")
    if REF_PYMOD not in sys.path:
        sys.path.insert(0, REF_PYMOD)
    try:
        import sirilpy  # noqa: F401
    except Exception as e:        # pragma: no cover - env dependent
        pytest.skip(f"sirilpy import failed: {e}")


@pytest.fixture
def script_repo(tmp_path):
    """A fixture 'community scripts' git repo, synced locally the way
    reloadscripts does."""
    if not _have_git():
        pytest.skip("git not available")
    src = tmp_path / "siril-scripts-upstream"
    src.mkdir()
    (src / "Invert.py").write_text(INVERT_SCRIPT, encoding="utf-8")
    (src / "HalfFlux.py").write_text(PIXELMATH_SCRIPT, encoding="utf-8")
    (src / "preprocessing").mkdir()
    (src / "preprocessing" / "QuickStack.py").write_text(STACK_SCRIPT, encoding="utf-8")
    env = dict(os.environ,
               GIT_AUTHOR_NAME="t", GIT_AUTHOR_EMAIL="t@t",
               GIT_COMMITTER_NAME="t", GIT_COMMITTER_EMAIL="t@t")
    subprocess.run(["git", "init", "-q", "-b", "main"], cwd=src,
                   check=True, env=env, capture_output=True)
    subprocess.run(["git", "add", "-A"], cwd=src, check=True, env=env,
                   capture_output=True)
    subprocess.run(["git", "commit", "-qm", "community scripts"],
                   cwd=src, check=True, env=env, capture_output=True)
    local = str(tmp_path / "synced-scripts")
    assert sync_repository(str(src), local)
    return local


@pytest.fixture
def pyenv(monkeypatch):
    """Make ``import sirilpy`` resolve to the UNMODIFIED reference
    package inside the pyscript subprocess."""
    _require_sirilpy()
    monkeypatch.setenv("PYTHONPATH", REF_PYMOD + os.pathsep
                       + os.environ.get("PYTHONPATH", ""))


class TestCommunityScripts:
    def test_repo_lists_synced_scripts(self, script_repo):
        names = list_scripts(script_repo)
        assert any(n.endswith("Invert.py") for n in names)
        assert any(n.endswith("QuickStack.py") for n in names)

    def test_invert_script(self, script_repo, pyenv, tmp_path):
        ctx = Session(cwd=str(tmp_path))
        ctx.set_image(SirilImage(
            data=np.full((1, 32, 48), 0.25, np.float32)))
        rc = process_command_line(
            ctx, f'pyscript "{os.path.join(script_repo, "Invert.py")}"')
        assert rc == 0
        np.testing.assert_allclose(ctx.image.host(), 0.75, atol=1e-6)

    def test_pixelmath_script(self, script_repo, pyenv, tmp_path):
        ctx = Session(cwd=str(tmp_path))
        ctx.set_image(SirilImage(
            data=np.full((3, 24, 40), 0.5, np.float32)))
        rc = process_command_line(
            ctx, f'pyscript "{os.path.join(script_repo, "HalfFlux.py")}"')
        assert rc == 0
        np.testing.assert_allclose(ctx.image.host(), 0.25, atol=1e-6)

    def test_quickstack_script(self, script_repo, pyenv, tmp_path):
        ctx = Session(cwd=str(tmp_path))
        rng = np.random.default_rng(3)
        scene = (0.2 + 0.1 * rng.random((16, 20))).astype(np.float32)
        for i in range(6):
            f = scene + rng.normal(0, 0.005, scene.shape).astype(
                np.float32)
            write_fits(SirilImage(data=np.clip(f, 0, 1)[None]),
                       os.path.join(str(tmp_path), f"li_{i:05d}.fit"),
                       bitdepth=16)
        rc = process_command_line(
            ctx, 'pyscript "%s"' % os.path.join(
                script_repo, "preprocessing", "QuickStack.py"))
        assert rc == 0
        assert ctx.image is not None
        out = ctx.image.host()[0]
        assert out.shape == scene.shape
        assert np.abs(out - scene).mean() < 0.005
