"""Snapshot the live XLA compilation cache into the committed seed dir.

Run after warming kernels (a bench pass, ``siril-tpu precompile``, or a
full pipeline run) so fresh VMs in later rounds start with a warm cache:
``utils/jaxcache.enable_compilation_cache`` copies these entries back
into ``~/.cache/siril_tpu_jax`` on first use.  Entries are content-keyed
(HLO + compiler version); on a non-matching image JAX just misses.

Only entries >= MIN_KB are copied (small programs recompile in seconds
even on a degraded remote-compile day; the multi-minute hazards are the
big fused/Mosaic programs), and the seed is capped at CAP_MB by dropping
the smallest entries first.

The seed MIRRORS the selection: committed entries that are no longer in
the live cache (or fell outside the size window) are DELETED, so entries
invalidated by a jaxlib upgrade or superseded kernels don't accumulate
in git history forever (ADVICE r4).  Set SEED_KEEP_STALE=1 to disable
the pruning for a purely additive snapshot.
"""

import os
import shutil
import sys

MIN_KB = int(os.environ.get("SEED_MIN_KB", "24"))
CAP_MB = int(os.environ.get("SEED_CAP_MB", "300"))

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
src = os.environ.get("SIRIL_TPU_JAX_CACHE",
                     os.path.expanduser("~/.cache/siril_tpu_jax"))
dst = os.path.join(repo, "cache_seed")
os.makedirs(dst, exist_ok=True)

try:
    names = os.listdir(src)
except FileNotFoundError:
    print(f"error: live cache dir {src} does not exist — run a warm "
          f"pass (bench.py or `siril-tpu precompile`) first", file=sys.stderr)
    sys.exit(1)

entries = []
for name in names:
    if name.endswith("-cache"):
        p = os.path.join(src, name)
        sz = os.path.getsize(p)
        if sz >= MIN_KB << 10:
            entries.append((sz, name))
# SMALLEST first: the driver's bench gates on the many small-to-medium
# pipeline programs; the handful of ~20 MB probe giants then take
# whatever remains of the cap (several are stale experiment programs
# anyway).  Size-descending greedy previously evicted every pipeline
# program whenever a few giants landed.
entries.sort()

total = 0
copied = 0
selected = set()
for sz, name in entries:
    if total + sz > CAP_MB << 20:
        continue        # smaller remaining entries may still fit the cap
    shutil.copyfile(os.path.join(src, name), os.path.join(dst, name))
    selected.add(name)
    total += sz
    copied += 1

pruned = 0
if not os.environ.get("SEED_KEEP_STALE"):
    for name in os.listdir(dst):
        if name.endswith("-cache") and name not in selected:
            os.unlink(os.path.join(dst, name))
            pruned += 1

print(f"seeded {copied}/{len(entries)} entries, "
      f"{total / 1e6:.1f} MB -> {dst} (pruned {pruned} stale)")
sys.exit(0)
