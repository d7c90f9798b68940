"""Cache-seed guard tests (VERDICT r4 ask #4 + ADVICE r4).

The committed ``cache_seed/`` contains XLA:CPU AOT executables compiled
with the build VM's machine features (AVX-512/AMX).  XLA's cache key
does not include the CPU model, so on a plainer driver VM such an entry
would load and SIGILL mid-execution (the MULTICHIP_r04 warning).  The
guard in utils/jaxcache must skip exactly those entries.
"""

import os

import pytest

from siril_tpu.utils import jaxcache


def _make_entry(path, name, payload: bytes, compress=True):
    data = payload
    if compress:
        import zstandard

        data = zstandard.ZstdCompressor().compress(payload)
    with open(os.path.join(path, name), "wb") as f:
        f.write(data)


def _feature_blob(feats: str) -> bytes:
    return (b"\x00\x01xla-aot" + feats.encode() + b"\x00trailing" +
            os.urandom(64))


class TestFeatureGuard:
    def test_poisoned_entry_skipped(self, tmp_path, monkeypatch):
        """An entry requiring a fantasy ISA the host lacks is not copied;
        a TPU-style entry (no feature list) and a compatible CPU entry
        are."""
        seed = tmp_path / "seed"
        live = tmp_path / "live"
        seed.mkdir()
        live.mkdir()
        monkeypatch.setattr(jaxcache, "SEED_DIR", str(seed))

        # poisoned: requires avx512fp16 + amx-tile (assume absent) — use
        # a synthetic host flag set to make the test host-independent
        monkeypatch.setattr(jaxcache, "_host_cpu_flags",
                            lambda: {"sse2", "avx", "avx2", "fma"})
        _make_entry(str(seed), "poisoned-cache", _feature_blob(
            "+64bit,+adx,+avx,+avx2,+avx512f,+avx512fp16,+amx-tile,"
            "-sse4a,+prefer-no-gather"))
        # compatible CPU entry: only features the synthetic host has
        _make_entry(str(seed), "compat-cache", _feature_blob(
            "+64bit,+avx,+avx2,+fma,-sse4a,+prefer-no-gather"))
        # TPU-style entry: no feature list at all
        _make_entry(str(seed), "tpu-cache", b"\x08mosaic" + os.urandom(128))
        # uncompressed CPU entry with missing features
        _make_entry(str(seed), "raw-poisoned-cache", _feature_blob(
            "+64bit,+avx,+avx512bf16,+avx512f,-sse4a"), compress=False)

        n = jaxcache.seed_from_repo(str(live))
        got = sorted(os.listdir(str(live)))
        assert "poisoned-cache" not in got
        assert "raw-poisoned-cache" not in got
        assert "compat-cache" in got
        assert "tpu-cache" in got
        assert n == 2

    def test_unreadable_cpuinfo_is_permissive(self, tmp_path, monkeypatch):
        seed = tmp_path / "seed"
        live = tmp_path / "live"
        seed.mkdir()
        live.mkdir()
        monkeypatch.setattr(jaxcache, "SEED_DIR", str(seed))
        monkeypatch.setattr(jaxcache, "_host_cpu_flags", lambda: None)
        _make_entry(str(seed), "poisoned-cache", _feature_blob(
            "+avx512f,+amx-tile"))
        assert jaxcache.seed_from_repo(str(live)) == 1

    def test_real_host_accepts_own_seed(self, tmp_path, monkeypatch):
        """On the machine that PRODUCED the committed seed, every entry
        must pass the guard (the guard may only bite on weaker hosts)."""
        if not os.path.isdir(jaxcache.SEED_DIR):
            pytest.skip("no committed seed")
        names = [n for n in os.listdir(jaxcache.SEED_DIR)
                 if n.endswith("-cache")][:20]
        if not names:
            pytest.skip("empty seed")
        flags = jaxcache._host_cpu_flags()
        if flags is None:
            pytest.skip("no /proc/cpuinfo")
        for n in names:
            req = jaxcache._entry_required_flags(
                os.path.join(jaxcache.SEED_DIR, n))
            assert req is None or req.issubset(flags), \
                (n, sorted(req - flags))


class TestStaleTmpSweep:
    def test_dead_pid_tmp_removed_live_kept(self, tmp_path):
        live = tmp_path / "live"
        live.mkdir()
        dead = str(live / ".seed_999999_x.tmp")      # no such pid
        mine = str(live / f".seed_{os.getpid()}_y.tmp")
        other = str(live / "real-cache")
        for p in (dead, mine, other):
            with open(p, "wb") as f:
                f.write(b"z")
        jaxcache._sweep_stale_tmps(str(live))
        assert not os.path.exists(dead)
        assert os.path.exists(mine)          # own pid: in-flight copy
        assert os.path.exists(other)         # not a temp

    def test_malformed_tmp_removed(self, tmp_path):
        live = tmp_path / "live"
        live.mkdir()
        bad = str(live / ".seed_notapid_z.tmp")
        with open(bad, "wb") as f:
            f.write(b"z")
        jaxcache._sweep_stale_tmps(str(live))
        assert not os.path.exists(bad)
