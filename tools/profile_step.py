#!/usr/bin/env python3
"""Per-component timing of the flagship train step on the real chip.

The axon tunnel makes per-op profiling impractical (no local HLO profile,
~27 ms per fetched value), so this measures jitted *segments* with the
dispatch-N-fetch-once protocol: each segment is jitted standalone, run
once to compile, then dispatched N times back-to-back with a single
scalar fetch at the end.  Segments cover the flagship FPNHybridFusion
step at the reference train shapes (B=4, OCT 32x128x496, SLO 320x128):

  * full train step / forward-only / value_and_grad (no optimizer)
  * each 3D encoder stage (fwd and fwd+bwd)
  * each projection head
  * the 2D encoder, decoder blocks, final conv, loss

Usage: python tools/profile_step.py [--fast] [--seg NAME]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, args, n=10, windows=2):
    """Compile, then fastest-of-`windows` mean ms over n dispatches."""
    out = fn(*args)
    leaf = jax_leaf(out)
    float(leaf)  # compile + sync
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        leaf = jax_leaf(out)
        float(leaf)
        best = min(best, (time.time() - t0) / n)
    return best * 1e3


def jax_leaf(tree):
    import jax
    leaves = jax.tree.leaves(tree)
    x = leaves[0]
    return x.ravel()[0] if hasattr(x, "ravel") else x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="fewer iters")
    ap.add_argument("--seg", default=None, help="only segments containing")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--json", default=None,
                    help="also dump {segment: ms} to this path")
    args = ap.parse_args()
    n = 4 if args.fast else 10

    import jax
    import jax.numpy as jnp
    from multimodal_fusion_fpn_tpu.config import make_config
    from multimodal_fusion_fpn_tpu.losses import Mix, bce_loss, dice_loss_joint
    from multimodal_fusion_fpn_tpu.models.blocks import EncoderStage, ZDimReduction
    from multimodal_fusion_fpn_tpu.models.zoo import build_model
    from multimodal_fusion_fpn_tpu.models.unet3d import NUM_REDUCTIONS
    from multimodal_fusion_fpn_tpu.train.optim import sgd
    from multimodal_fusion_fpn_tpu.train.state import create_train_state
    from multimodal_fusion_fpn_tpu.train.step import make_train_step

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B = args.batch
    rng = np.random.default_rng(0)
    results = {}

    def want(name):
        return args.seg is None or args.seg in name

    def record(name, ms):
        results[name] = ms
        print(f"{name:42s} {ms:8.1f} ms", flush=True)

    # ---- stage-level segments ------------------------------------------
    CH = (16, 32, 64, 128, 256)
    SHAPES = [(32, 128, 496), (32, 64, 248), (32, 32, 124),
              (16, 16, 62), (8, 8, 31)]
    IN_CH = (1, 16, 32, 64, 128)

    for lvl in range(5):
        name = f"enc3d_s{lvl + 1}"
        if not want(name):
            continue
        y, x_, z = SHAPES[lvl]
        stage = EncoderStage(CH[lvl], downsample=(IN_CH[lvl] != CH[lvl]),
                             ndim=3, dtype=dtype)
        xin = jnp.asarray(rng.normal(size=(B, y, x_, z, IN_CH[lvl])),
                          dtype)
        vs = jax.jit(lambda a: stage.init(jax.random.PRNGKey(0), a))(xin)

        fwd = jax.jit(lambda v, a: stage.apply(
            v, a, train=True, mutable=["batch_stats"])[0])
        record(name + "_fwd", timeit(fwd, (vs, xin), n))

        def loss(v, a):
            out, _ = stage.apply(v, a, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)
        g = jax.jit(jax.grad(lambda v, a: loss(v, a)))
        record(name + "_fwdbwd", timeit(g, (vs, xin), n))

    for lvl in range(5):
        name = f"proj_s{lvl + 1}"
        if not want(name):
            continue
        y, x_, z = SHAPES[lvl]
        proj = ZDimReduction(CH[lvl], num_reductions=NUM_REDUCTIONS[lvl],
                             dtype=dtype)
        xin = jnp.asarray(rng.normal(size=(B, y, x_, z, CH[lvl])), dtype)
        vs = jax.jit(lambda a: proj.init(jax.random.PRNGKey(0), a))(xin)
        fwd = jax.jit(lambda v, a: jnp.mean(proj.apply(
            v, a, train=True, mutable=["batch_stats"])[0], axis=3))
        record(name + "_fwd", timeit(fwd, (vs, xin), n))

        def loss(v, a):
            out, _ = proj.apply(v, a, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)
        g = jax.jit(jax.grad(loss))
        record(name + "_fwdbwd", timeit(g, (vs, xin), n))

    # ---- 2D encoder stack (SLO branch) -----------------------------------
    if want("enc2d"):
        from flax import linen as nn

        class Enc2D(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                in_ch = x.shape[-1]
                from multimodal_fusion_fpn_tpu.models.blocks import max_pool
                from multimodal_fusion_fpn_tpu.models.fusion import POOLS_2D
                for lvl in range(5):
                    x = EncoderStage(CH[lvl], downsample=(in_ch != CH[lvl]),
                                     ndim=2, dtype=dtype,
                                     name=f"c{lvl}")(x, train)
                    if lvl < 4:
                        x = max_pool(x, POOLS_2D[min(lvl, 3)])
                    in_ch = CH[lvl]
                return x

        enc2d = Enc2D()
        xin = jnp.asarray(rng.normal(size=(B, 320, 128, 1)), dtype)
        vs = jax.jit(lambda a: enc2d.init(jax.random.PRNGKey(0), a))(xin)
        fwd = jax.jit(lambda v, a: enc2d.apply(
            v, a, train=True, mutable=["batch_stats"])[0])
        record("enc2d_stack_fwd", timeit(fwd, (vs, xin), n))

        def loss2d(v, a):
            out, _ = enc2d.apply(v, a, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)
        g = jax.jit(jax.grad(loss2d))
        record("enc2d_stack_fwdbwd", timeit(g, (vs, xin), n))

    # ---- decoder stack ---------------------------------------------------
    if want("decoder"):
        from flax import linen as nn
        from multimodal_fusion_fpn_tpu.models.blocks import UpBlockFusion
        from multimodal_fusion_fpn_tpu.models.unet3d import UPFACTORS

        class Dec(nn.Module):
            @nn.compact
            def __call__(self, projected, aligned, deep,
                         train: bool = False):
                up = deep
                for i, lvl in enumerate((3, 2, 1, 0)):
                    up = UpBlockFusion(
                        CH[lvl], upfactor=UPFACTORS[i], mode="concat",
                        dtype=dtype, name=f"up{lvl}")(
                            projected[lvl], aligned[lvl], up, train)
                return up

        dec = Dec()
        PSHAPES = [(32, 128), (32, 64), (32, 32), (16, 16), (8, 8)]
        projected = [jnp.asarray(rng.normal(
            size=(B, y, x_, 1, CH[i])), dtype)
            for i, (y, x_) in enumerate(PSHAPES)]
        aligned = projected[:4]
        deep = jnp.asarray(rng.normal(size=(B, 8, 8, 1, 512)), dtype)
        vs = jax.jit(lambda p, a, d: dec.init(
            jax.random.PRNGKey(0), p, a, d))(projected, aligned, deep)
        fwd = jax.jit(lambda v, p, a, d: dec.apply(
            v, p, a, d, train=True, mutable=["batch_stats"])[0])
        record("decoder_stack_fwd",
               timeit(fwd, (vs, projected, aligned, deep), n))

        def lossd(v, p, a, d):
            out, _ = dec.apply(v, p, a, d, train=True,
                               mutable=["batch_stats"])
            return jnp.sum(out * out)
        g = jax.jit(jax.grad(lossd))
        record("decoder_stack_fwdbwd",
               timeit(g, (vs, projected, aligned, deep), n))

    # ---- full model segments -------------------------------------------
    # device_put BEFORE timing: numpy operands re-upload through the
    # axon tunnel (~50 MB/s) on every dispatch and swamp the step.
    batch = jax.device_put({
        "image": rng.normal(size=(B, 1, 32, 496, 128)).astype(np.float32),
        "slo": rng.normal(size=(B, 1, 320, 1, 128)).astype(np.float32),
        "mask": (rng.random((B, 1, 32, 1, 128)) > 0.7).astype(np.float32),
    })
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo", training_dataset="hrf_fusion")
    model = build_model(cfg, dtype=dtype, remat=False)
    tx = sgd(0.1)
    criterion = Mix({"Dice Loss": dice_loss_joint(), "BCE loss": bce_loss()})
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)

    if want("forward"):
        fwd = jax.jit(lambda p, bs, b: model.apply(
            {"params": p, "batch_stats": bs}, b, train=True,
            mutable=["batch_stats"])[0]["prediction"])
        record("full_forward(train)", timeit(
            fwd, (state.params, state.batch_stats, batch), n))

    if want("grad"):
        def lossf(p, bs, b):
            out, mut = model.apply({"params": p, "batch_stats": bs}, b,
                                   train=True, mutable=["batch_stats"])
            loss, _ = criterion(b, out)
            return loss
        g = jax.jit(jax.grad(lossf))
        record("full_value_and_grad", timeit(
            g, (state.params, state.batch_stats, batch), n))

    if want("step"):
        step = make_train_step(model, tx, criterion, donate=False)
        key = jax.random.PRNGKey(1)
        st = [state]

        def run(s, b, k):
            ns, aux = step(s, b, k)
            return aux["loss"]
        record("full_train_step", timeit(run, (state, batch, key), n))

    print("\n--- summary (ms) ---")
    tot3d = sum(v for k, v in results.items()
                if k.startswith("enc3d") and k.endswith("fwdbwd"))
    totproj = sum(v for k, v in results.items()
                  if k.startswith("proj") and k.endswith("fwdbwd"))
    if tot3d:
        print(f"3D encoder fwd+bwd total: {tot3d:.1f}")
    if totproj:
        print(f"projection fwd+bwd total: {totproj:.1f}")
    for k in ("full_forward(train)", "full_value_and_grad",
              "full_train_step"):
        if k in results:
            print(f"{k}: {results[k]:.1f}")

    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"dtype": args.dtype, "batch": B,
                       "segments_ms": {k: round(v, 2)
                                       for k, v in results.items()}},
                      f, indent=1)
        print(f"# wrote {args.json}")


if __name__ == "__main__":
    main()
