#!/usr/bin/env python3
"""Minimal on-chip repro: which fused Pallas kernel fails to compile in
bf16 (the flagship bf16 config dies with tpu_compile_helper exit 1 while
fp32 passes and MMF_FUSED=off bf16 passes)."""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc

B, Y, X, nb, bs, ci, co = 1, 4, 8, 8, 8, 16, 16


def trial(name, fn):
    try:
        out = fn()
        out = jax.tree.map(lambda a: np.asarray(a), out)
        print(f"{name}: OK", flush=True)
    except Exception:
        print(f"{name}: FAIL\n{traceback.format_exc(limit=3)}",
              flush=True)


def main():
    which = sys.argv[1:] or ["all"]
    rng = np.random.default_rng(0)
    for dt_name in ("bf16", "fp32"):
        dt = jnp.bfloat16 if dt_name == "bf16" else jnp.float32
        x = jnp.asarray(rng.normal(size=(B, Y, X, nb * bs, ci)),
                        dt)
        xp = fc.pack(x, bs)
        s = jnp.asarray(rng.normal(size=(bs * ci,)), dt)
        b = jnp.asarray(rng.normal(size=(bs * ci,)), dt)
        for kshape in (((1, 3, 3)), ((3, 1, 1)), ((1, 1, 1))):
            w = jnp.asarray(rng.normal(size=kshape + (ci, co)) * 0.1, dt)
            tag = f"{dt_name} k={kshape}"
            if which[0] in ("all", "fwd"):
                trial(f"fwd  {tag}", lambda w=w: jax.jit(
                    lambda xp, s, b, w: fc.fused_conv_pallas(
                        [xp], [s], [b], w, X, nb, bs,
                        preferred_element_type=dt))(xp, s, b, w))
            if which[0] in ("all", "grad"):
                def loss(xp, s, b, w):
                    y = fc.fused_conv([xp], [s], [b], w, X, nb, bs,
                                      preferred_element_type=dt,
                                      impl="pallas")
                    return jnp.sum(y.astype(jnp.float32) ** 2)
                trial(f"grad {tag}", lambda w=w: jax.jit(
                    jax.grad(loss, argnums=(0, 1, 2, 3)))(xp, s, b, w))


if __name__ == "__main__":
    main()
