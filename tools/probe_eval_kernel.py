#!/usr/bin/env python3
"""Standalone on-chip probe: one fused_conv FWD at the EVAL
whole-volume shape (B=1, fp32/bf16) — is the 5.5 s, 5-member eval
forward a KERNEL-level collapse at these shapes or a graph-level one?

Floor reference: the (1, 48, 11904, 128) fp32 buffer is 292 MB; a
(1,3,3) conv fwd reads ~1 pass + writes 1 -> ~0.7 ms at 850 GB/s.

Usage: python tools/probe_eval_kernel.py [--dtype fp32] [--members 1]
One JSON line per config to stdout + --log.
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
        REPO, "results", "probe_eval_kernel.jsonl"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc

    B, Y, X, Z, C, bs = 1, 48, 192, 496, 16, 8
    nb = Z // bs
    rng = np.random.default_rng(0)
    os.makedirs(os.path.dirname(args.log), exist_ok=True)

    for dtn in ("fp32", "bf16"):
        dt = jnp.float32 if dtn == "fp32" else jnp.bfloat16
        x = jnp.asarray(rng.normal(size=(B, Y, X, Z, C)), dt)
        xp = fc.pack(x, bs)
        s = jnp.asarray(rng.normal(size=(bs * C,)), dt)
        b = jnp.asarray(rng.normal(size=(bs * C,)), dt)
        w = jnp.asarray(rng.normal(size=(1, 3, 3, C, C)) * 0.3, dt)
        for impl in ("pallas", "ref"):
            try:
                f = jax.jit(lambda xp, s, b, w: fc.fused_conv(
                    [xp], [s], [b], w, X, nb, bs, relu=True,
                    preferred_element_type=dt, impl=impl))
                y = f(xp, s, b, w)
                _ = float(jnp.sum(y.astype(jnp.float32)))
                n = 20
                t0 = time.time()
                for _i in range(n):
                    y = f(xp, s, b, w)
                v = float(jnp.sum(y.astype(jnp.float32)))
                dtms = (time.time() - t0) / n * 1000 - 1.85  # dispatch
                rec = {"probe": "fused_conv_fwd_evalshape",
                       "impl": impl, "dtype": dtn,
                       "ms": round(dtms, 2),
                       "floor_ms": round(
                           2 * B * Y * X * nb * bs * C
                           * (4 if dtn == "fp32" else 2) / 850e9 * 1e3,
                           2)}
            except Exception as exc:  # noqa: BLE001 — probe tool
                rec = {"probe": "fused_conv_fwd_evalshape",
                       "impl": impl, "dtype": dtn,
                       "error": str(exc)[:300]}
            line = json.dumps(rec)
            print(line, flush=True)
            with open(args.log, "a") as fh:
                fh.write(line + "\n")


if __name__ == "__main__":
    main()
