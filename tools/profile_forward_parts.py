#!/usr/bin/env python3
"""Bisect the flagship forward: cumulative timing of pipeline prefixes.

Times jitted PREFIXES of the FPNHybridFusion forward (encoder only;
+projection; +2D encoder+alignment; +decoder; full model apply) at the
flagship shapes to locate time that lives BETWEEN the per-module
segments (pools, permutes, packing, alignment, depth-means).

Usage: python tools/profile_forward_parts.py [--dtype bf16] [--batch 4]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, args, n=10, windows=3):
    import jax
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.time() - t0) / n)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["fp32", "bf16"])
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from multimodal_fusion_fpn_tpu.models.blocks import (EncoderStage,
                                                         ZDimReduction,
                                                         max_pool)
    from multimodal_fusion_fpn_tpu.models.fusion import POOLS_2D
    from multimodal_fusion_fpn_tpu.models.unet3d import (NUM_REDUCTIONS,
                                                         POOLS_3D)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B = args.batch
    CH = (16, 32, 64, 128, 256)
    rng = np.random.default_rng(0)
    oct_in = jnp.asarray(rng.normal(size=(B, 32, 128, 496, 1)), dtype)
    slo_in = jnp.asarray(rng.normal(size=(B, 320, 128, 1)), dtype)

    class Prefix(nn.Module):
        upto: str  # enc3d | proj | enc2d | full

        @nn.compact
        def __call__(self, x, slo, train: bool = True):
            convs = []
            in_ch = x.shape[-1]
            for lvl in range(5):
                x = EncoderStage(CH[lvl], downsample=(in_ch != CH[lvl]),
                                 ndim=3, dtype=dtype,
                                 name=f"c{lvl}")(x, train)
                convs.append(x)
                if lvl < 4:
                    x = max_pool(x, POOLS_3D[lvl])
                in_ch = CH[lvl]
            if self.upto == "enc3d":
                return sum(jnp.sum(c) for c in convs)
            projected = []
            for lvl in range(5):
                p = ZDimReduction(CH[lvl],
                                  num_reductions=NUM_REDUCTIONS[lvl],
                                  dtype=dtype,
                                  name=f"z{lvl}")(convs[lvl], train)
                p = jnp.mean(p, axis=3, keepdims=True)
                projected.append(p)
            if self.upto == "proj":
                return sum(jnp.sum(p) for p in projected)
            skips2d = []
            s = slo
            in_ch = s.shape[-1]
            for lvl in range(5):
                s = EncoderStage(CH[lvl], downsample=(in_ch != CH[lvl]),
                                 ndim=2, dtype=dtype,
                                 name=f"d{lvl}")(s, train)
                skips2d.append(s)
                if lvl < 4:
                    s = max_pool(s, POOLS_2D[min(lvl, 3)])
                in_ch = CH[lvl]
            # alignment: adaptive max-pool each 2D skip to the 3D
            # skip's en-face shape, as 5D
            from multimodal_fusion_fpn_tpu.ops.pooling import \
                adaptive_max_pool
            aligned = []
            for lvl in range(5):
                s5 = skips2d[lvl][:, :, :, None, :]
                tgt = projected[lvl].shape[1:4]
                aligned.append(adaptive_max_pool(s5, tgt, (1, 2, 3)))
            if self.upto == "enc2d":
                return (sum(jnp.sum(p) for p in projected)
                        + sum(jnp.sum(a) for a in aligned))
            raise ValueError(self.upto)

    for upto in ("enc3d", "proj", "enc2d"):
        m = Prefix(upto)
        vs = jax.jit(lambda a, b, m=m: m.init(jax.random.PRNGKey(0), a, b,
                                              train=False))(oct_in, slo_in)
        f = jax.jit(lambda vs, a, b, m=m: m.apply(
            vs, a, b, train=True, mutable=["batch_stats"])[0])
        print(f"{upto:8s} fwd {timeit(f, (vs, oct_in, slo_in)):8.1f} ms",
              flush=True)

    # the real model for reference
    from multimodal_fusion_fpn_tpu.config import make_config
    from multimodal_fusion_fpn_tpu.models.zoo import build_model
    batch = {
        "image": rng.normal(size=(B, 1, 32, 496, 128)).astype(np.float32),
        "slo": rng.normal(size=(B, 1, 320, 1, 128)).astype(np.float32),
    }
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo", training_dataset="hrf_fusion")
    model = build_model(cfg, dtype=dtype, remat=False)
    vs = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b,
                                      train=False))(batch)
    f = jax.jit(lambda vs, b: model.apply(
        vs, b, train=True, mutable=["batch_stats"])[0]["prediction"])
    print(f"{'full':8s} fwd {timeit(f, (vs, batch)):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
