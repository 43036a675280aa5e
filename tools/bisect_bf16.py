#!/usr/bin/env python3
"""Bisect which default kernel path breaks the flagship bf16 compile on
the real chip (ADVICE r2, high): run the bf16 B=4 config under the knob
combination given on the command line and report compile+run success.

Usage: python tools/bisect_bf16.py [PROJ=0] [FUSED=off] [CAP=n]
Knobs are applied via env BEFORE model build.
"""

import os
import sys
import time

for arg in sys.argv[1:]:
    k, _, v = arg.partition("=")
    env = {"PROJ": "MMF_FUSED_PROJ", "FUSED": "MMF_FUSED",
           "CAP": "MMF_FUSED_PROJ_CAP"}[k]
    os.environ[env] = v
    print(f"# {env}={v}", flush=True)


def main():
    import jax
    import numpy as np

    from bench import _run_config

    t0 = time.time()
    try:
        img_s, dt = _run_config(4, "bf16", False)
        print(f"OK: {dt * 1000:.1f} ms/step, {img_s:.2f} img/s "
              f"(total {time.time() - t0:.0f}s)", flush=True)
    except Exception as exc:
        print(f"FAIL after {time.time() - t0:.0f}s: {str(exc)[:300]}",
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
