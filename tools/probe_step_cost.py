#!/usr/bin/env python3
"""Per-grid-step fixed cost of a Pallas kernel on the real chip.

Roadmap lead (round-5 eval isolation): the whole-volume forward is
dtype-INSENSITIVE ⇒ latency/overhead-bound.  This probe runs ONE fused
conv at constant total work while sweeping the rows-per-step G (grid
(B, Y/G)); the slope of time vs step count is the per-step fixed cost.

Usage: python tools/probe_step_cost.py
One JSON line per G to --log (default results/probe_step_cost.jsonl).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default=os.path.join(
        REPO, "results", "probe_step_cost.jsonl"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc

    # stage-1-like geometry, bf16: RX=7936, CC=128, Y=32, B=1 (so slab
    # bytes stay within the VMEM cap at every G)
    B, Y, X, Z, C, bs = 1, 32, 128, 496, 16, 8
    nb = Z // bs
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, Y, X, Z, C)), dt)
    xp = fc.pack(x, bs)
    s = jnp.asarray(rng.normal(size=(bs * C,)), dt)
    b = jnp.asarray(rng.normal(size=(bs * C,)), dt)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, C, C)) * 0.3, dt)

    os.makedirs(os.path.dirname(args.log), exist_ok=True)
    for G in (1, 2):  # slab cap allows <=2 at this CC/RX in bf16
        os.environ["MMF_G1"] = str(G)
        try:
            # CHAIN the calls (output feeds the next input) so the
            # device serializes them — independent calls pipeline and
            # the window measures only dispatch (first attempt read
            # negative ms after the dispatch correction)
            f = jax.jit(lambda xp, s, b, w: fc.fused_conv(
                [xp], [s], [b], w, X, nb, bs, relu=True,
                preferred_element_type=dt, impl="pallas"))
            y = f(xp, s, b, w)
            _ = float(jnp.sum(y.astype(jnp.float32)))
            n = 30
            t0 = time.time()
            y = xp
            for _i in range(n):
                y = f(y, s, b, w)
            _ = float(jnp.sum(y.astype(jnp.float32)))
            ms = (time.time() - t0) / n * 1000
            rec = {"probe": "fused_conv_fwd_stepcost", "G": G,
                   "steps": B * (Y // max(G, 1)), "ms": round(ms, 3)}
        except Exception as exc:  # noqa: BLE001 — probe tool
            rec = {"probe": "fused_conv_fwd_stepcost", "G": G,
                   "error": str(exc)[:300]}
        finally:
            os.environ.pop("MMF_G1", None)
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.log, "a") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
