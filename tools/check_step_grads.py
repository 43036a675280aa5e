#!/usr/bin/env python3
"""FULL-STEP gradient comparison bf16 vs fp32 — CAVEAT: NOT a
correctness verdict.  A CPU interpret-mode control run (kernels exact)
already shows 231/275 leaves below cos 0.9: a bf16 forward walks a
different loss-surface point, so full-model gradient DIRECTIONS
legitimately decorrelate for small-norm leaves at random init.  Use
tools/repro_dx_bf16.py --geo s1full (per-op fp32-oracle cosines) for
kernel-correctness verdicts; keep this tool only for gross syndromes
(all-zero grads).

The round-5 s1full triage shows the standalone bf16 backward kernels
corrupting at full stage-1 shapes (dx ~zeros) even after the
bitcast-mask fix.  This tool asks the question that actually matters:
are the FLAGSHIP TRAIN STEP's gradients wrong?  It computes one
training gradient at the bench config in bf16 and in fp32 from the
same init/batch and reports the per-leaf cosine similarity + norm
ratios of the parameter cotangents (bf16 rounding keeps cosine ~0.99+;
a zeros/garbage backward collapses it).

Usage: python tools/check_step_grads.py [--spec tiny|full]
One JSON line per worst leaves + a summary verdict to --log.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default=os.path.join(
        REPO, "results", "step_grads_bf16.jsonl"))
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc
    if args.interpret:
        fc.set_interpret_mode(True)
    from multimodal_fusion_fpn_tpu.config import make_config
    from multimodal_fusion_fpn_tpu.losses import (Mix, bce_loss,
                                                  dice_loss_joint)
    from multimodal_fusion_fpn_tpu.models.zoo import build_model
    from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec
    from multimodal_fusion_fpn_tpu.train.optim import sgd
    from multimodal_fusion_fpn_tpu.train.state import create_train_state
    from multimodal_fusion_fpn_tpu.train.step import model_batch

    B = args.batch
    if args.interpret:
        Y, X, Z = 8, 32, 64
        spec = ArchSpec(channels=(2, 4, 8, 16, 32))
        slo_h, slo_w = 80, 32
    else:
        Y, X, Z = 32, 128, 496
        spec = None
        slo_h, slo_w = 320, 128
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(B, 1, Y, Z, X)).astype(np.float32),
        "slo": rng.normal(size=(B, 1, slo_h, 1, slo_w)).astype(
            np.float32),
        "mask": (rng.random((B, 1, Y, 1, X)) > 0.7).astype(np.float32),
    }
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo",
                      training_dataset="hrf_fusion")
    criterion = Mix({"Dice Loss": dice_loss_joint(),
                     "BCE loss": bce_loss()})

    mb = None

    def grads_for(dtype):
        model = build_model(cfg, spec=spec, dtype=dtype, remat=False)
        mb = model_batch(batch)
        st = create_train_state(model, sgd(0.1), jax.random.PRNGKey(0),
                                mb)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": st.batch_stats},
                mb, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            loss, _parts = criterion(mb, out)
            return loss

        g = jax.jit(jax.grad(loss_fn))(st.params)
        return jax.tree.map(np.asarray, g)

    import jax.numpy as jnp  # noqa: F811
    g32 = grads_for(jnp.float32)
    g16 = grads_for(jnp.bfloat16)

    flat32 = jax.tree_util.tree_leaves_with_path(g32)
    flat16 = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(g16)}
    rows = []
    for p, a32 in flat32:
        key = jax.tree_util.keystr(p)
        a16 = np.asarray(flat16[key], np.float64).ravel()
        a32r = np.asarray(a32, np.float64).ravel()
        n16, n32 = np.linalg.norm(a16), np.linalg.norm(a32r)
        cosv = (float(a16 @ a32r / (n16 * n32))
                if n16 > 0 and n32 > 0 else (1.0 if n16 == n32 else 0.0))
        rows.append({"leaf": key, "cos": round(cosv, 4),
                     "norm_bf16": round(float(n16), 4),
                     "norm_fp32": round(float(n32), 4)})
    rows.sort(key=lambda r: r["cos"])
    bad = [r for r in rows if r["cos"] < 0.9]
    summary = {"probe": "step_grads_bf16_vs_fp32", "leaves": len(rows),
               "bad_leaves": len(bad),
               "worst": rows[:8],
               "ok": len(bad) == 0}
    os.makedirs(os.path.dirname(args.log), exist_ok=True)
    with open(args.log, "a") as fh:
        fh.write(json.dumps(summary) + "\n")
    print(json.dumps(summary, indent=1)[:2000])
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
