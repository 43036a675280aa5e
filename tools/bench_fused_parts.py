#!/usr/bin/env python3
"""On-chip decomposition of one fused encoder conv's cost (fwd kernel,
dx kernel, dband kernel, full VJP, BN stats, pool) at flagship shapes.

Usage: python tools/bench_fused_parts.py [--dtype bf16] [--stage 1|2|3]

Dispatch-N-fetch-once protocol (axon: block_until_ready does not sync).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def timeit(fn, args, n=10, windows=3):
    import jax
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)
        best = min(best, (time.time() - t0) / n)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B, Y = 4, 32
    # stage geometry: (X, Z, C, bs)
    # bs follows EncoderStage._fused_eligible: bs*C = 128 preferred
    geo = {1: (128, 496, 16, 8), 2: (64, 248, 32, 4), 3: (32, 124, 64, 2)}
    X, Z, C, bs = geo[args.stage]
    nb = Z // bs
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, Y, X, Z, C)), dt)
    xp = jax.device_put(fc.pack(x, bs))
    s = jax.device_put(jnp.asarray(rng.normal(size=(bs * C,)), dt))
    b = jax.device_put(jnp.asarray(rng.normal(size=(bs * C,)), dt))
    w = jnp.asarray(rng.normal(size=(1, 3, 3, C, C)) * 0.1, dt)
    band, wplus, wminus = fc._band_wrap_matrices(w, bs)
    band, wplus, wminus = map(jax.device_put, (band, wplus, wminus))
    g = jax.device_put(xp + jnp.asarray(0.01, dt))

    print(f"stage {args.stage}: X={X} Z={Z} C={C} bs={bs} "
          f"RX={xp.shape[2]} CC={xp.shape[3]} dtype={args.dtype}",
          flush=True)
    slab_mb = np.prod(xp.shape) * xp.dtype.itemsize / 1e6
    print(f"buffer: {slab_mb:.0f} MB", flush=True)

    kY, kX = 1, 3

    # 1. forward kernel alone
    fwd = jax.jit(lambda xp, s, b: fc._fused_conv_pallas_mats(
        [xp], [s], [b], band, wplus, wminus, kY, kX, X, nb, bs, True, dt))
    print(f"fwd kernel:      {timeit(fwd, (xp, s, b), args.n):7.2f} ms",
          flush=True)

    # 2. dx kernel alone
    bandT, wplusT, wminusT = fc._mats_T(band, wplus, wminus)
    dx = jax.jit(lambda xp, s, b, g: fc._dx_pallas(
        [xp], [s], [b], g, bandT, wplusT, wminusT, kY, kX, X, nb, bs,
        True))
    print(f"dx kernel:       {timeit(dx, (xp, s, b, g), args.n):7.2f} ms",
          flush=True)

    # 3. dband kernel alone
    db = jax.jit(lambda xp, s, b, g: fc._dband_pallas(
        [xp], [s], [b], g, kY, kX, X, nb, bs, True, want_wrap=True))
    print(f"dband kernel:    {timeit(db, (xp, s, b, g), args.n):7.2f} ms",
          flush=True)

    # 4. full VJP through the custom-vjp boundary (logical w)
    def loss(xp, s, b, w):
        y = fc.fused_conv([xp], [s], [b], w, X, nb, bs,
                          preferred_element_type=dt, impl="pallas")
        return jnp.sum(y.astype(jnp.float32) ** 2)
    vjp = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    print(f"full VJP:        {timeit(vjp, (xp, s, b, w), args.n):7.2f} ms",
          flush=True)

    # 5. BN interior stats
    st = jax.jit(lambda y: fc.interior_stats(y, X, nb, bs, B, Y))
    print(f"bn stats:        {timeit(st, (g,), args.n):7.2f} ms",
          flush=True)

    # 6. elementwise pass (one read+write) for reference
    ew = jax.jit(lambda y: y * jnp.asarray(1.01, dt))
    print(f"elementwise x1:  {timeit(ew, (g,), args.n):7.2f} ms",
          flush=True)

    # 7. pack/unpack
    pk = jax.jit(lambda x: fc.pack(x, bs))
    up = jax.jit(lambda y: fc.unpack(y, X, nb, bs))
    print(f"pack:            {timeit(pk, (x,), args.n):7.2f} ms",
          flush=True)
    print(f"unpack:          {timeit(up, (g,), args.n):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
