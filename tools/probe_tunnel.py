#!/usr/bin/env python3
"""Idempotent axon-tunnel health probe.

Runs a tiny jitted op on the default backend in a subprocess bounded by
--timeout (default 120 s) and appends one JSON line to
/tmp/tunnel_probe.log:  {"t": <unix>, "up": bool, "latency_s": float}.

Safe to re-run at any time (CLAUDE.md: the tunnel can drop for hours;
keep on-chip scripts idempotent and re-runnable).
"""

import argparse
import json
import subprocess
import sys
import time

CODE = ("import time, jax, jax.numpy as jnp; t0=time.time();"
        "v=float(jax.jit(lambda x: x + 1)(jnp.ones(())));"
        "print('PROBE_OK', time.time()-t0)")


def probe(timeout_s: float) -> dict:
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, "-c", CODE],
                              capture_output=True, text=True,
                              timeout=timeout_s)
        up = proc.returncode == 0 and "PROBE_OK" in proc.stdout
    except subprocess.TimeoutExpired:
        up = False
    return {"t": round(time.time()), "up": up,
            "latency_s": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=120.0)
    ap.add_argument("--log", default="/tmp/tunnel_probe.log")
    args = ap.parse_args()
    rec = probe(args.timeout)
    with open(args.log, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    sys.exit(0 if rec["up"] else 1)


if __name__ == "__main__":
    main()
