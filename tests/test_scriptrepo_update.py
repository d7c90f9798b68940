"""Script-repository sync (siril_git.c equivalent, against a local
fixture git repo — no network) and the update check
(siril_update.c version parse/compare + versions-JSON handling)."""

import json
import os
import subprocess

import pytest

from siril_tpu.utils.scriptrepo import (
    list_scripts,
    sync_repository,
)
from siril_tpu.utils.update import (
    check_for_updates,
    compare_version,
    newest_release,
    parse_version,
)


def _have_git():
    try:
        subprocess.run(["git", "--version"], capture_output=True,
                       check=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


@pytest.fixture
def fixture_repo(tmp_path):
    if not _have_git():
        pytest.skip("git not available")
    src = tmp_path / "upstream"
    src.mkdir()
    (src / "preprocessing.ssf").write_text("# a script\nrequires 1.2.0\n")
    (src / "tools").mkdir()
    (src / "tools" / "helper.py").write_text("print('hi')\n")
    (src / "README.md").write_text("not a script\n")
    env = dict(os.environ,
               GIT_AUTHOR_NAME="t", GIT_AUTHOR_EMAIL="t@t",
               GIT_COMMITTER_NAME="t", GIT_COMMITTER_EMAIL="t@t")

    def git(*args):
        subprocess.run(["git", *args], cwd=src, check=True, env=env,
                       capture_output=True)

    git("init", "-q", "-b", "main")
    git("add", "-A")
    git("commit", "-qm", "initial scripts")
    return str(src)


class TestScriptRepo:
    def test_clone_and_list(self, fixture_repo, tmp_path):
        local = str(tmp_path / "localrepo")
        assert sync_repository(fixture_repo, local)
        scripts = list_scripts(local)
        names = [os.path.basename(s) for s in scripts]
        assert "preprocessing.ssf" in names
        assert "helper.py" in names
        assert "README.md" not in names

    def test_fetch_reset_discards_local_edits(self, fixture_repo,
                                              tmp_path):
        local = str(tmp_path / "localrepo")
        assert sync_repository(fixture_repo, local)
        # local edit + upstream new script
        with open(os.path.join(local, "preprocessing.ssf"), "w") as f:
            f.write("local damage\n")
        env = dict(os.environ,
                   GIT_AUTHOR_NAME="t", GIT_AUTHOR_EMAIL="t@t",
                   GIT_COMMITTER_NAME="t", GIT_COMMITTER_EMAIL="t@t")
        with open(os.path.join(fixture_repo, "new_script.ssf"),
                  "w") as f:
            f.write("stack light rej 3 3\n")
        subprocess.run(["git", "add", "-A"], cwd=fixture_repo, env=env,
                       check=True, capture_output=True)
        subprocess.run(["git", "commit", "-qm", "add script"],
                       cwd=fixture_repo, env=env, check=True,
                       capture_output=True)
        assert sync_repository(fixture_repo, local)
        names = [os.path.basename(s) for s in list_scripts(local)]
        assert "new_script.ssf" in names
        assert "local damage" not in open(
            os.path.join(local, "preprocessing.ssf")).read()

    def test_remote_mismatch_refused(self, fixture_repo, tmp_path):
        local = str(tmp_path / "localrepo")
        assert sync_repository(fixture_repo, local)
        assert not sync_repository("file:///somewhere/else", local)

    def test_stale_lock_removed(self, fixture_repo, tmp_path):
        local = str(tmp_path / "localrepo")
        assert sync_repository(fixture_repo, local)
        lock = os.path.join(local, ".git", "index.lock")
        open(lock, "w").close()
        assert sync_repository(fixture_repo, local)
        assert not os.path.exists(lock)

    def test_reloadscripts_command(self, fixture_repo, tmp_path,
                                   monkeypatch):
        from siril_tpu.cli.context import Session
        from siril_tpu.cli.parser import process_command_line as cmd

        local = str(tmp_path / "cmdrepo")
        monkeypatch.setenv("SIRIL_TPU_SCRIPT_REPO", fixture_repo)
        monkeypatch.setenv("SIRIL_TPU_SCRIPT_REPO_DIR", local)
        ctx = Session(cwd=str(tmp_path))
        ctx.prefs.use_scripts_repository = True
        assert cmd(ctx, "reloadscripts") == 0
        assert os.path.isfile(os.path.join(local, "preprocessing.ssf"))


class TestVersionCompare:
    """Mirrors siril_update.c get_version_number_from_string +
    compare_version semantics."""

    def test_parse(self):
        v = parse_version("1.2.3")
        assert (v.major, v.minor, v.micro, v.patched) == (1, 2, 3, 0)
        assert not v.rc and not v.beta
        v = parse_version("siril-1.4.0-rc1")
        assert v.rc and v.patched == 1
        v = parse_version("1.4.0-beta2")
        assert v.beta and v.patched == 2
        v = parse_version("1.2.3-4")
        assert v.patched == 4 and not v.rc and not v.beta

    @pytest.mark.parametrize("a,b,expect", [
        ("1.0.0", "1.0.1", -1),
        ("1.2.0", "1.1.9", 1),
        ("1.2.3", "1.2.3", 0),
        ("1.4.0-beta1", "1.4.0-rc1", -1),
        ("1.4.0-rc1", "1.4.0", -1),
        ("1.4.0-beta1", "1.4.0", -1),
        ("1.4.0", "1.4.0-rc2", 1),
        ("1.4.0-rc1", "1.4.0-rc2", -1),
        ("1.2.3-1", "1.2.3-2", -1),
    ])
    def test_compare(self, a, b, expect):
        assert compare_version(parse_version(a), parse_version(b)) == \
            expect

    def test_newest_release_and_check(self):
        doc = json.dumps({"siril": {"stable": "1.4.5",
                                    "beta": "1.6.0-beta1"}}).encode()
        name, v = newest_release(doc)
        assert name == "1.4.5"                 # prereleases excluded
        name, v = newest_release(doc, include_prerelease=True)
        assert name == "1.6.0-beta1"

        class T:
            def get(self, url):
                return doc

        msg = check_for_updates(T(), current="1.2.0")
        assert "new version available: 1.4.5" in msg
        msg = check_for_updates(T(), current="1.9.0")
        assert "up to date" in msg

        class Down:
            def get(self, url):
                raise OSError("offline")

        assert "unable to check" in check_for_updates(Down())
