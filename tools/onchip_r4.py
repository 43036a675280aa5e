#!/usr/bin/env python3
"""Round-4 on-chip measurement batch (idempotent, tunnel-outage-aware).

Runs, each in a bounded subprocess, appending one JSON line per result
to --log (default /tmp/onchip_r4.jsonl) so a tunnel drop mid-batch
loses only the phase in flight (CLAUDE.md: keep on-chip scripts
idempotent and re-runnable; completed phases are skipped on re-run):

  1. train A/B: bf16 B=4 full step, MMF_FUSED_STATS=1 vs 0
     (the round-4 BN-stats kernel fusion).
  2. batch sweep: bf16 B=6 (no remat), B=8 (remat) on the winner.
  3. eval throughput: 5-member vmapped ensemble + fused device HD at a
     whole-volume shape (VERDICT r3 item 9) — images/sec including the
     per-image dispatch+fetch.

Usage:  python tools/onchip_r4.py [--only PHASE] [--timeout S]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRAIN_PHASES = [
    # name, B, prec, remat, env overrides
    ("train_b4_bf16_ws", 4, "bf16", False, {"MMF_FUSED_STATS": "1"}),
    ("train_b4_bf16_nows", 4, "bf16", False, {"MMF_FUSED_STATS": "0"}),
    # Y-chunked (3,1,1) kernels A/B (round 4, PERF roadmap 2): the
    # default is MMF_YCHUNK=8 (on), so _ws above measures WITH
    # chunking; this phase isolates its contribution.
    ("train_b4_bf16_noyck", 4, "bf16", False,
     {"MMF_FUSED_STATS": "1", "MMF_YCHUNK": "0"}),
    # merged dx+dband backward A/B (round 4): default is ON, this
    # phase isolates its contribution.
    ("train_b4_bf16_nomerge", 4, "bf16", False,
     {"MMF_FUSED_STATS": "1", "MMF_MERGED_BWD": "0"}),
    # 2D en-face encoder on the fused kernels (round 4, singleton-X
    # mapping): default is ON, this phase isolates its contribution —
    # and a Mosaic compile failure here indicts only the 2D variant.
    ("train_b4_bf16_no2d", 4, "bf16", False,
     {"MMF_FUSED_STATS": "1", "MMF_FUSED_2D": "0"}),
    # Multi-row grid blocking for the kY==1 kernels (round 4, MMF_G1):
    # default ON; this phase isolates its contribution.
    ("train_b4_bf16_nog1", 4, "bf16", False,
     {"MMF_FUSED_STATS": "1", "MMF_G1": "0"}),
    # (round-5: MMF_POOL_ROW default flipped OFF — the row kernels are
    # Mosaic-rejected at full shapes, results/mosaic_bisect_r5.jsonl —
    # so the old nopoolrow A/B phase is the default and was dropped.)
    # K-window CHUNKED rows (round-5 middle ground): first Mosaic
    # compile check at full shapes + A/B vs the per-window default.
    ("train_b4_bf16_rowk8", 4, "bf16", False,
     {"MMF_FUSED_STATS": "1", "MMF_POOL_ROWK": "8"}),
    # (round-5: the MMF_SLAB_MB=8 probe was compile-REJECTED on chip —
    # G=4 8 MB slabs are over the boundary; 4 MB/G=2 is the widest
    # compiling config.  Evidence: results/stage_ab.log.)
    ("train_b6_bf16_ws", 6, "bf16", False, {"MMF_FUSED_STATS": "1"}),
    ("train_b8_bf16_remat_ws", 8, "bf16", True,
     {"MMF_FUSED_STATS": "1"}),
    # B=8 WITHOUT remat: the padless buffers + fused stats dropped HBM
    # pressure since the round-2 OOM boundary; subprocess-bounded, so
    # an OOM costs one phase.
    ("train_b8_bf16_ws", 8, "bf16", False, {"MMF_FUSED_STATS": "1"}),
]

EVAL_CODE = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.models.zoo import build_model
from multimodal_fusion_fpn_tpu.train.optim import sgd
from multimodal_fusion_fpn_tpu.train.state import create_train_state
from multimodal_fusion_fpn_tpu.train.step import (make_ensemble_eval_step,
                                                  model_batch)
from multimodal_fusion_fpn_tpu.eval.harness import stack_ensemble

# whole-volume-ish eval shape (RelFit multiples of 16): 48 B-scans x
# 496 depth x 192 width, en-face 208x192 — close to real HRF volumes.
Y, Z, X = 48, 496, 192
EH, EW = 208, 192
rng = np.random.default_rng(0)
batch = {
    "image": rng.normal(size=(1, 1, Y, Z, X)).astype(np.float32),
    "slo": rng.normal(size=(1, 1, EH, 1, EW)).astype(np.float32),
    "mask": (rng.random((1, 1, Y, 1, X)) > 0.7).astype(np.float32),
}
cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                  fusion_modality="slo", training_dataset="hrf_fusion")
model = build_model(cfg, dtype=jnp.float32, remat=False)
mb = model_batch(batch)
st = create_train_state(model, sgd(0.1), jax.random.PRNGKey(0), mb)
members = [{"params": st.params, "batch_stats": st.batch_stats}
           for _ in range(5)]
sp = stack_ensemble([m["params"] for m in members])
sb = stack_ensemble([m["batch_stats"] for m in members])
step = make_ensemble_eval_step(model, with_hd=True)
spacing = np.asarray([0.12, 0.012], np.float32)
dev_in = jax.device_put(mb)
out = step(sp, sb, dev_in, spacing)
_ = float(np.asarray(out["__device_hd95__"]))  # compile + run
n = 10
t0 = time.time()
for i in range(n):
    out = step(sp, sb, dev_in, spacing)
    hd = float(np.asarray(out["__device_hd95__"]))  # fetch per image
dt = (time.time() - t0) / n
print("ONCHIP_RESULT " + json.dumps({
    "phase": "eval_ensemble5_hd", "ms_per_image": round(dt * 1000, 1),
    "img_per_s": round(1.0 / dt, 2),
    "shape": [Y, Z, X], "enface": [EH, EW], "hd95_value": hd}))
"""

# eval-cost isolation (round 5: eval_ensemble5_hd measured 5983 ms/img
# — 20x the back-of-envelope fwd estimate; these phases decompose it):
# 1 member vs 5 members (vmap scaling), no-HD vs HD (device-EDT cost).
EVAL_ISO_CODE = r"""
import json, os, time
import numpy as np
import jax, jax.numpy as jnp
from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.models.zoo import build_model
from multimodal_fusion_fpn_tpu.train.optim import sgd
from multimodal_fusion_fpn_tpu.train.state import create_train_state
from multimodal_fusion_fpn_tpu.train.step import (make_ensemble_eval_step,
                                                  model_batch)
from multimodal_fusion_fpn_tpu.eval.harness import stack_ensemble

MEMBERS = int(os.environ.get("ISO_MEMBERS", "5"))
BATCH = int(os.environ.get("ISO_BATCH", "1"))
WITH_HD = os.environ.get("ISO_HD", "0") == "1"
HD_ONLY = os.environ.get("ISO_HD_ONLY", "0") == "1"
DTYPE = jnp.bfloat16 if os.environ.get("ISO_DTYPE") == "bf16" \
    else jnp.float32
PHASE = os.environ["ISO_PHASE"]
Y, Z, X = 48, 496, 192
EH, EW = 208, 192
rng = np.random.default_rng(0)
spacing = np.asarray([0.12, 0.012], np.float32)
if HD_ONLY:
    from multimodal_fusion_fpn_tpu.metrics.device import hausdorff_device
    pred = jnp.asarray(rng.random((Y, X)) > 0.5)
    gt = jnp.asarray(rng.random((Y, X)) > 0.5)

    @jax.jit
    def hd_fn(p, g, sp):
        hd, _ = hausdorff_device(p, g, sp, connectivity=1)
        _, hd95 = hausdorff_device(p, g, sp, connectivity=3)
        return hd, hd95
    out = hd_fn(pred, gt, spacing)
    _ = float(np.asarray(out[1]))
    n = 20
    t0 = time.time()
    for i in range(n):
        out = hd_fn(pred, gt, spacing)
        v = float(np.asarray(out[1]))
    dt = (time.time() - t0) / n
    print("ONCHIP_RESULT " + json.dumps({
        "phase": PHASE, "ms_per_image": round(dt * 1000, 1),
        "img_per_s": round(1.0 / dt, 2), "hd95": v}))
else:
    batch = {
        "image": rng.normal(size=(BATCH, 1, Y, Z, X)).astype(np.float32),
        "slo": rng.normal(size=(BATCH, 1, EH, 1, EW)).astype(np.float32),
        "mask": (rng.random((BATCH, 1, Y, 1, X)) > 0.7)
        .astype(np.float32),
    }
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo", training_dataset="hrf_fusion")
    model = build_model(cfg, dtype=DTYPE, remat=False)
    mb = model_batch(batch)
    st = create_train_state(model, sgd(0.1), jax.random.PRNGKey(0), mb)
    sp = stack_ensemble([st.params] * MEMBERS)
    sb = stack_ensemble([st.batch_stats] * MEMBERS)
    step = make_ensemble_eval_step(model, with_hd=WITH_HD)
    dev_in = jax.device_put(mb)
    args = (sp, sb, dev_in, spacing) if WITH_HD else (sp, sb, dev_in)
    out = step(*args)
    key = "__device_hd95__" if WITH_HD else "prediction"
    _ = float(np.asarray(out[key]).ravel()[0])
    n = 10
    t0 = time.time()
    for i in range(n):
        out = step(*args)
        v = float(np.asarray(out[key]).ravel()[0])
    dt = (time.time() - t0) / n / BATCH
    print("ONCHIP_RESULT " + json.dumps({
        "phase": PHASE, "ms_per_image": round(dt * 1000, 1),
        "img_per_s": round(1.0 / dt, 2), "members": MEMBERS,
        "batch": BATCH, "with_hd": WITH_HD}))
"""

EVAL_ISO_PHASES = [
    ("eval_iso_m1", {"ISO_MEMBERS": "1", "ISO_HD": "0"}),
    ("eval_iso_m5", {"ISO_MEMBERS": "5", "ISO_HD": "0"}),
    ("eval_iso_m5_hd", {"ISO_MEMBERS": "5", "ISO_HD": "1"}),
    ("eval_iso_hdonly", {"ISO_HD_ONLY": "1"}),
    ("eval_iso_m1_bf16", {"ISO_MEMBERS": "1", "ISO_HD": "0",
                          "ISO_DTYPE": "bf16"}),
    ("eval_iso_m5_bf16", {"ISO_MEMBERS": "5", "ISO_HD": "0",
                          "ISO_DTYPE": "bf16"}),
    # B=4 volumes per dispatch: is the slowdown B=1-specific?
    ("eval_iso_m5_b4", {"ISO_MEMBERS": "5", "ISO_HD": "0",
                        "ISO_BATCH": "4"}),
    ("eval_iso_m5_b4_bf16", {"ISO_MEMBERS": "5", "ISO_HD": "0",
                             "ISO_BATCH": "4", "ISO_DTYPE": "bf16"}),
]

# bucketed eval: a NON-bucket-aligned true shape padded by the harness
# heuristic, extent-masked fused kernels active (the production
# default path) — also the first Mosaic compile check of the dyn
# kernels.
EVAL_BUCKET_CODE = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.eval.harness import _bucket_pad, stack_ensemble
from multimodal_fusion_fpn_tpu.models.zoo import build_model
from multimodal_fusion_fpn_tpu.train.optim import sgd
from multimodal_fusion_fpn_tpu.train.state import create_train_state
from multimodal_fusion_fpn_tpu.train.step import (make_ensemble_eval_step,
                                                  model_batch)

Y, Z, X = 48, 496, 176   # 176 % 64 != 0 -> harness pads to 192
EH, EW = 208, 176
rng = np.random.default_rng(0)
batch = {
    "image": rng.normal(size=(1, 1, Y, Z, X)).astype(np.float32),
    "slo": rng.normal(size=(1, 1, EH, 1, EW)).astype(np.float32),
    "mask": (rng.random((1, 1, Y, 1, X)) > 0.7).astype(np.float32),
}
cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                  fusion_modality="slo", training_dataset="hrf_fusion")
model = build_model(cfg, dtype=jnp.float32, remat=False)
mb = _bucket_pad(model_batch(batch), 64)
st = create_train_state(model, sgd(0.1), jax.random.PRNGKey(0), mb)
sp = stack_ensemble([st.params] * 5)
sb = stack_ensemble([st.batch_stats] * 5)
step = make_ensemble_eval_step(model, with_hd=False)
dev_in = jax.device_put(mb)
out = step(sp, sb, dev_in)
_ = float(np.asarray(out["prediction"]).sum())
n = 10
t0 = time.time()
for i in range(n):
    out = step(sp, sb, dev_in)
    s = float(np.asarray(out["prediction"][0, 0, 0, 0, :8]).sum())
dt = (time.time() - t0) / n
print("ONCHIP_RESULT " + json.dumps({
    "phase": "eval_bucketed_dyn", "ms_per_image": round(dt * 1000, 1),
    "img_per_s": round(1.0 / dt, 2),
    "true_shape": [Y, Z, X], "padded_x": int(mb["image"].shape[4])}))
"""

TRAIN_CODE = r"""
import json, sys
sys.path.insert(0, {repo!r})
import bench
img_s, dt = bench._run_config({B}, {prec!r}, {remat})
print("ONCHIP_RESULT " + json.dumps({{
    "phase": {name!r}, "img_per_s": round(img_s, 2),
    "ms_per_step": round(dt * 1000, 1), "fused_stats": {ws!r}}}))
"""


def done_phases(log):
    done = set()
    if os.path.exists(log):
        with open(log) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["phase"])
                except (ValueError, KeyError):
                    pass
    return done


def run_phase(name, code, env_extra, timeout, log):
    env = dict(os.environ, **env_extra)
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True,
                              timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        print(f"# {name}: TIMEOUT after {timeout}s", file=sys.stderr)
        return False
    sys.stderr.write((proc.stderr or "")[-1500:])
    for line in (proc.stdout or "").splitlines():
        if line.startswith("ONCHIP_RESULT "):
            rec = json.loads(line[len("ONCHIP_RESULT "):])
            rec["wall_s"] = round(time.time() - t0, 1)
            with open(log, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec))
            return True
    print(f"# {name}: no result (rc={proc.returncode}) "
          f"{(proc.stdout or '')[-300:]!r}", file=sys.stderr)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/onchip_r4.jsonl")
    ap.add_argument("--only", default=None)
    ap.add_argument("--timeout", type=float, default=1500.0)
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    done = set() if args.redo else done_phases(args.log)
    failed = []
    _run_phase_impl = globals()['run_phase']

    def run_phase(name, code, env_extra, timeout, log):
        ok = _run_phase_impl(name, code, env_extra, timeout, log)
        if not ok:
            failed.append(name)
        return ok
    for name, B, prec, remat, env in TRAIN_PHASES:
        if args.only and args.only != name:
            continue
        if name in done:
            print(f"# {name}: already done, skipping")
            continue
        code = TRAIN_CODE.format(repo=REPO, B=B, prec=prec, remat=remat,
                                 name=name,
                                 ws=env.get("MMF_FUSED_STATS", "1"))
        run_phase(name, code, env, args.timeout, args.log)
    if (not args.only or args.only == "eval_ensemble5_hd") \
            and "eval_ensemble5_hd" not in done:
        run_phase("eval_ensemble5_hd", EVAL_CODE, {}, args.timeout,
                  args.log)
    for name, env in EVAL_ISO_PHASES:
        if (not args.only or args.only == name) and name not in done:
            run_phase(name, EVAL_ISO_CODE,
                      dict(env, ISO_PHASE=name), args.timeout, args.log)
    # eval 2-conv mega-kernel A/B (MMF_FUSED_PAIR): also the first
    # Mosaic compile check of _kernel2 — if it fails, keep the default
    # off and record the error.
    if (not args.only or args.only == "eval_pair") \
            and "eval_ensemble5_hd_pair" not in done:
        code = EVAL_CODE.replace('"phase": "eval_ensemble5_hd"',
                                 '"phase": "eval_ensemble5_hd_pair"')
        run_phase("eval_ensemble5_hd_pair", code,
                  {"MMF_FUSED_PAIR": "1"}, args.timeout, args.log)
    # bucketed (extent-masked) eval — the production default path;
    # first Mosaic compile check of the dyn kernels.
    if (not args.only or args.only == "eval_bucketed_dyn") \
            and "eval_bucketed_dyn" not in done:
        run_phase("eval_bucketed_dyn", EVAL_BUCKET_CODE, {},
                  args.timeout, args.log)
    # whole-block chain kernel (MMF_FUSED_CHAIN, supersedes the pair):
    # one kernel per ConvX block in eval — Mosaic compile check + A/B
    # on both the plain and the bucketed-dyn eval paths.
    if (not args.only or args.only == "eval_chain") \
            and "eval_ensemble5_hd_chain" not in done:
        code = EVAL_CODE.replace('"phase": "eval_ensemble5_hd"',
                                 '"phase": "eval_ensemble5_hd_chain"')
        run_phase("eval_ensemble5_hd_chain", code,
                  {"MMF_FUSED_CHAIN": "1"}, args.timeout, args.log)
    if (not args.only or args.only == "eval_chain") \
            and "eval_bucketed_dyn_chain" not in done:
        code = EVAL_BUCKET_CODE.replace(
            '"phase": "eval_bucketed_dyn"',
            '"phase": "eval_bucketed_dyn_chain"')
        run_phase("eval_bucketed_dyn_chain", code,
                  {"MMF_FUSED_CHAIN": "1"}, args.timeout, args.log)
    print(f"# results in {args.log}")
    if failed:
        # nonzero so a staged watcher retries the batch on the
        # next tunnel window instead of marking it done with
        # phases missing (round-5 outage lesson)
        print(f"# FAILED phases: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
