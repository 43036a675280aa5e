#!/usr/bin/env python3
"""Remote-compile the (1-member) ensemble eval step and dump its
OPTIMIZED HLO for byte-level audit (tools/hlo_report.py) — the round-5
eval decomposition support: the 5-member fp32 whole-volume forward
measures ~5.5 s vs a ~0.4 s scaling estimate, and the HLO's
materialized-copy accounting is the only profiling window the axon
tunnel offers.

Usage: python tools/dump_eval_hlo.py [--members 1] [--dtype fp32]
Writes results/eval_hlo_m{members}_{dtype}.txt and prints the
hlo_report summary.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=1)
    ap.add_argument("--dtype", default="fp32", choices=("fp32", "bf16"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from multimodal_fusion_fpn_tpu.config import make_config
    from multimodal_fusion_fpn_tpu.eval.harness import stack_ensemble
    from multimodal_fusion_fpn_tpu.models.zoo import build_model
    from multimodal_fusion_fpn_tpu.train.optim import sgd
    from multimodal_fusion_fpn_tpu.train.state import create_train_state
    from multimodal_fusion_fpn_tpu.train.step import (
        make_ensemble_eval_step, model_batch)

    Y, Z, X, EH, EW = 48, 496, 192, 208, 192
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(1, 1, Y, Z, X)).astype(np.float32),
        "slo": rng.normal(size=(1, 1, EH, 1, EW)).astype(np.float32),
        "mask": (rng.random((1, 1, Y, 1, X)) > 0.7).astype(np.float32),
    }
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo",
                      training_dataset="hrf_fusion")
    dt = jnp.float32 if args.dtype == "fp32" else jnp.bfloat16
    model = build_model(cfg, dtype=dt, remat=False)
    mb = model_batch(batch)
    st = create_train_state(model, sgd(0.1), jax.random.PRNGKey(0), mb)
    sp = stack_ensemble([st.params] * args.members)
    sb = stack_ensemble([st.batch_stats] * args.members)
    step = make_ensemble_eval_step(model, with_hd=False)
    txt = step.lower(sp, sb, mb).compile().as_text()
    out = os.path.join(REPO, "results",
                       f"eval_hlo_m{args.members}_{args.dtype}.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(txt)
    print(f"# wrote {out} ({len(txt) / 1e6:.1f} MB)")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "hlo_report.py"), out,
                    "--top", "25"])


if __name__ == "__main__":
    main()
