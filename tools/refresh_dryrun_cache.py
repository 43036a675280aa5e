#!/usr/bin/env python3
"""Regenerate the committed dryrun compile-cache snapshot.

The driver's first ``dryrun_multichip(8)`` on a clean checkout costs a
~300 s cold CPU compile; ``__graft_entry__`` seeds ``.jax_cache`` from
the committed ``.dryrun_cache/`` snapshot (~5 MB) so it's warm.

CRITICAL KEY FACT (measured, round 5): this jax version hashes the
WHOLE config — including ``jax_compilation_cache_dir`` itself — into
the persistent-cache key, so entries are only reusable when generated
under the EXACT SAME cache-dir path the consumer uses.  The snapshot
must therefore be produced against the real ``.jax_cache`` path:
  1. move ``.jax_cache`` aside (forces the dryrun cold),
  2. run the dryrun (writes fresh entries under the canonical path),
  3. copy them to ``.dryrun_cache/``,
  4. merge the old cache back.
Concurrent cache users see a cold cache for the window — they
recompile, nothing breaks.

Usage: python tools/refresh_dryrun_cache.py   (re-run + commit
.dryrun_cache whenever the traced step graph changes)
"""

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAP = os.path.join(REPO, ".dryrun_cache")
CACHE = os.path.join(REPO, ".jax_cache")
BAK = CACHE + ".refresh_bak"


def main():
    if os.path.exists(BAK):
        sys.exit(f"{BAK} exists — a previous refresh died mid-way; "
                 f"merge or remove it first")
    have_old = os.path.isdir(CACHE)
    if have_old:
        os.rename(CACHE, BAK)
    os.makedirs(CACHE, exist_ok=True)
    try:
        code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
        env = dict(os.environ)
        env.pop("MMF_CACHE_DIR", None)  # must use the canonical path
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              cwd=REPO, timeout=900)
        if proc.returncode != 0:
            sys.exit(proc.returncode)
        shutil.rmtree(SNAP, ignore_errors=True)
        shutil.copytree(CACHE, SNAP)
    finally:
        # merge the old entries back (new ones win on collision —
        # they're identical anyway, same key = same program)
        if have_old:
            for name in os.listdir(BAK):
                tgt = os.path.join(CACHE, name)
                if not os.path.exists(tgt):
                    os.rename(os.path.join(BAK, name), tgt)
            shutil.rmtree(BAK)
    n = len(os.listdir(SNAP))
    size = sum(os.path.getsize(os.path.join(SNAP, f))
               for f in os.listdir(SNAP))
    print(f"snapshot: {n} entries, {size / 2**20:.1f} MB -> {SNAP}")
    print("commit it: git add .dryrun_cache && git commit")


if __name__ == "__main__":
    main()
