#!/usr/bin/env python3
"""Regenerate the committed dryrun compile-cache snapshot.

Runs ``dryrun_multichip(8)`` cold into ``.dryrun_cache/`` (cleared
first) so a clean checkout's first driver dryrun hits a warm cache
(~10 s instead of a ~300 s cold CPU compile).  Re-run + commit the
directory whenever the traced step graph changes (model, kernels,
optimizer, sharding).

Usage: python tools/refresh_dryrun_cache.py
"""

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAP = os.path.join(REPO, ".dryrun_cache")


def main():
    shutil.rmtree(SNAP, ignore_errors=True)
    env = dict(os.environ, MMF_CACHE_DIR=SNAP)
    code = ("import __graft_entry__ as g; g.dryrun_multichip(8)")
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd=REPO, timeout=900)
    if proc.returncode != 0:
        sys.exit(proc.returncode)
    n = len(os.listdir(SNAP)) if os.path.isdir(SNAP) else 0
    size = sum(os.path.getsize(os.path.join(SNAP, f))
               for f in os.listdir(SNAP)) if n else 0
    print(f"snapshot: {n} entries, {size / 2**20:.1f} MB -> {SNAP}")
    print("commit it: git add -f .dryrun_cache && git commit")


if __name__ == "__main__":
    main()
