#!/usr/bin/env python3
"""IN-GRAPH per-kernel-call cost: lax.fori_loop of N fused-conv calls
inside ONE jit — no host dispatch in the measured region, so the slope
of time vs N is the true on-device per-call constant (kernel launch +
prologue), separating it from the ~1.85 ms host dispatch that pollutes
chained-dispatch probes (tools/probe_step_cost.py).

Usage: python tools/probe_call_cost.py
One JSON line per N to --log (default results/probe_call_cost.jsonl).
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
        REPO, "results", "probe_call_cost.jsonl"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc

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
    for N in (4, 16):
        try:
            @jax.jit
            def f(xp, s, b, w, N=N):
                def body(_i, y):
                    return fc.fused_conv([y], [s], [b], w, X, nb, bs,
                                         relu=True,
                                         preferred_element_type=dt,
                                         impl="pallas")
                return lax.fori_loop(0, N, body, xp)

            y = f(xp, s, b, w)
            _ = float(jnp.sum(y.astype(jnp.float32)))
            reps = 10
            t0 = time.time()
            for _i in range(reps):
                y = f(xp, s, b, w)
            _ = float(jnp.sum(y.astype(jnp.float32)))
            total_ms = (time.time() - t0) / reps * 1000 - 1.85
            rec = {"probe": "fused_conv_ingraph_callcost", "N": N,
                   "ms_total": round(total_ms, 3),
                   "ms_per_call": round(total_ms / N, 4)}
        except Exception as exc:  # noqa: BLE001 — probe tool
            rec = {"probe": "fused_conv_ingraph_callcost", "N": N,
                   "error": str(exc)[:300]}
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.log, "a") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
