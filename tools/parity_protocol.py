#!/usr/bin/env python3
"""Turnkey training/eval parity protocol (VERDICT r3 item 5).

One command that produces a parity report between this framework and
the PyTorch reference, at the reference recipe's semantics
(`/root/reference/run.sh:11-33`, SGD lr/momentum/wd of
`/root/reference/train.py:126-133`, Mix(Dice+BCE) of
`training_config.py:90-95`).

Two modes:

* ``--mode oracle`` (default — runs ANYWHERE, incl. CI): golden run
  against the PL-free torch oracle (tests/torch_oracle.py, itself
  certified bit-equal to the actual reference models by
  tests/test_oracle_certification.py).  Both frameworks start from the
  SAME weights and consume the SAME batch stream from this framework's
  real data pipeline; the report records the per-step loss trajectory
  delta, the final prediction delta and per-image Dice delta on the
  val split, and the eval-artifact schema check
  (`/root/reference/test_utils.py:373-383` file set).
* ``--mode reference``: subprocess the ACTUAL reference ``train.py`` /
  ``validate_ensemble.py`` (requires torch+pytorch_lightning+medpy —
  typically on the user's GPU box) and this repo's CLI with the same
  flags on the same tree, then diff ``mean_results.json`` /
  ``test_output.csv`` schema and values.

Exit code: 0 = parity within tolerances, 1 = parity violation,
2 = mode prerequisites missing.
"""

import argparse
import json
import os
import subprocess
import sys
from os.path import join
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

ARTIFACT_SCHEMA = {
    # reference eval artifact set: test_utils.py:373-383, 215-265
    "run_files": ["test_output.csv", "results_dict.json",
                  "mean_results.json", "global_metrics.json"],
    "per_image_files": ["test.png", "test_soft.png", "mask.png",
                        "info.json"],
    "mean_results_stats": ["mean", "std", "median", "q25", "q75"],
}


# ---------------------------------------------------------------------------
# oracle mode
# ---------------------------------------------------------------------------

def run_oracle_protocol(data_root, workdir, steps=6, batch_size=2,
                        channels=(2, 4, 8, 16, 32), f64=True,
                        rtol=1e-6, atol=1e-8):
    import jax
    if f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import torch

    from torch_oracle import TFPNHybrid, randomize
    from multimodal_fusion_fpn_tpu.config import make_config
    from multimodal_fusion_fpn_tpu.data.loader import DataLoader
    from multimodal_fusion_fpn_tpu.losses import (Mix, bce_loss,
                                                  dice_loss_joint)
    from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec
    from multimodal_fusion_fpn_tpu.models.zoo import build_model
    from multimodal_fusion_fpn_tpu.train.configs import data_config_factory
    from multimodal_fusion_fpn_tpu.train.optim import sgd
    from multimodal_fusion_fpn_tpu.train.state import TrainState
    from multimodal_fusion_fpn_tpu.train.step import (make_eval_step,
                                                      make_train_step,
                                                      model_batch)
    from multimodal_fusion_fpn_tpu.train.torch_import import map_state_dict

    os.makedirs(workdir, exist_ok=True)
    if data_root is None:
        from multimodal_fusion_fpn_tpu.data.synthetic import \
            make_synthetic_hrf
        paths = make_synthetic_hrf(join(workdir, "data"), n_patients=4,
                                   d=16, h=64, w=32, enface_h=80,
                                   enface_w=32, seed=11)
        data_root = paths["oct"]
    split_path = join(data_root, "split.json")
    with open(split_path) as f:
        split = json.load(f)

    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo", training_dataset="hrf_fusion",
                      data_root=data_root, multiplier=2,
                      batch_size=batch_size)
    data_config = data_config_factory["hrf_fusion"](cfg)
    tr, tv = data_config.get_transforms()
    train_data = data_config.train_data(split["train"], tr)
    val_data = data_config.val_data(split["val"], tv)
    loader = DataLoader(train_data, batch_size=batch_size, shuffle=True,
                        drop_last=True, num_workers=0, seed=1234)
    val_loader = DataLoader(val_data, batch_size=1, shuffle=False,
                            drop_last=False, num_workers=0,
                            transform_rng=False)

    dt = np.float64 if f64 else np.float32
    jdt = jnp.float64 if f64 else jnp.float32

    # identical init: randomize torch, map into flax
    tmodel = randomize(TFPNHybrid(ch=tuple(channels),
                                  interpolate="2d_max"), seed=33)
    if f64:
        tmodel = tmodel.double()
    model = build_model(cfg, spec=ArchSpec(channels=tuple(channels)),
                        remat=False, dtype=jdt)

    loader.set_epoch(0)
    batches = []
    it = iter(loader)
    while len(batches) < steps:
        try:
            b = next(it)
        except StopIteration:
            loader.set_epoch(len(batches))
            it = iter(loader)
            continue
        batches.append({k: np.asarray(v, dt) if hasattr(v, "dtype")
                        and np.issubdtype(np.asarray(v).dtype, np.floating)
                        else v for k, v in b.items()})

    jb0 = {k: jnp.asarray(v) for k, v in model_batch(batches[0]).items()}
    variables = model.init({"params": jax.random.PRNGKey(0)}, jb0,
                           train=False)
    params, batch_stats = map_state_dict(
        tmodel.state_dict(), variables["params"],
        variables.get("batch_stats", {}))
    params = jax.tree.map(lambda v: np.array(v, dt), params)
    batch_stats = jax.tree.map(lambda v: np.array(v, dt), batch_stats)
    tx = sgd(cfg.learning_rate, momentum=0.9, weight_decay=1e-4)
    state = TrainState(step=0, params=params, batch_stats=batch_stats,
                       opt_state=tx.init(params))

    criterion = Mix({"Dice Loss": dice_loss_joint(),
                     "BCE loss": bce_loss()})
    step = make_train_step(model, tx, criterion,
                           compute_train_metrics=False, donate=False)

    def torch_mix_loss(pred, gt):
        shape = gt.shape
        p = pred.reshape(shape[0], shape[1], -1)
        g = gt.reshape(shape[0], shape[1], -1)
        inter = (p * g).sum(dim=(0, 2)) + 1e-6
        union = (p ** 2 + g).sum(dim=(0, 2)) + 2e-6
        dice = 1.0 - (2.0 * inter / union).mean()
        bce = torch.nn.functional.binary_cross_entropy(
            pred.reshape(-1), gt.reshape(-1))
        return (dice + bce) / 2.0

    opt = torch.optim.SGD(tmodel.parameters(), lr=cfg.learning_rate,
                          momentum=0.9, weight_decay=1e-4)

    # free-running trajectory, both sides on the SAME batches
    traj = []
    for i, b in enumerate(batches):
        jb = {k: jnp.asarray(v) for k, v in model_batch(b).items()}
        state, aux = step(state, jb, jax.random.PRNGKey(i + 1))
        f_loss = float(aux["loss"])
        tmodel.train()
        tb = {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()
              if hasattr(v, "dtype")}
        out = tmodel(tb)["prediction"]
        t_loss = torch_mix_loss(out, tb["mask"])
        opt.zero_grad()
        t_loss.backward()
        opt.step()
        traj.append({"step": i, "loss_tpu": f_loss,
                     "loss_torch": float(t_loss),
                     "abs_delta": abs(f_loss - float(t_loss))})

    # final-state eval parity on the val split
    eval_step = make_eval_step(model)
    tmodel.eval()
    per_image = []
    from multimodal_fusion_fpn_tpu.metrics import Dice
    for vb in val_loader:
        mb = model_batch({k: np.asarray(v, dt) if hasattr(v, "dtype")
                          and np.issubdtype(np.asarray(v).dtype,
                                            np.floating)
                          else v for k, v in vb.items()})
        f_pred = np.asarray(eval_step(state.params, state.batch_stats,
                                      mb)["prediction"])
        with torch.no_grad():
            t_pred = tmodel({k: torch.from_numpy(np.asarray(v))
                             for k, v in mb.items()
                             if hasattr(v, "dtype")})["prediction"]
        t_pred = t_pred.numpy()
        dm = Dice(output_key="prediction", target_key="mask", slice=0)
        d_f = float(np.asarray(dm.calculate_batch(
            vb, {"prediction": f_pred})).item())
        dm2 = Dice(output_key="prediction", target_key="mask", slice=0)
        d_t = float(np.asarray(dm2.calculate_batch(
            vb, {"prediction": t_pred})).item())
        per_image.append({
            "id": vb["FileSetId"][0],
            "dice_tpu": d_f, "dice_torch": d_t,
            "dice_delta": abs(d_f - d_t),
            "pred_max_abs_delta": float(np.max(np.abs(f_pred - t_pred))),
        })

    max_loss_delta = max(t["abs_delta"] for t in traj)
    max_dice_delta = max(p["dice_delta"] for p in per_image)
    max_pred_delta = max(p["pred_max_abs_delta"] for p in per_image)
    tol_loss = atol + rtol * max(abs(t["loss_torch"]) for t in traj)
    ok = (max_loss_delta <= tol_loss and max_dice_delta <= 1e-6
          and max_pred_delta <= 1e-5)

    report = {
        "mode": "oracle",
        "precision": "float64" if f64 else "float32",
        "steps": steps,
        "trajectory": traj,
        "per_image": per_image,
        "max_loss_delta": max_loss_delta,
        "max_dice_delta": max_dice_delta,
        "max_pred_delta": max_pred_delta,
        "pass": bool(ok),
    }
    if f64:
        jax.config.update("jax_enable_x64", False)
    return report


# ---------------------------------------------------------------------------
# reference mode
# ---------------------------------------------------------------------------

def _check_artifacts(out_dir):
    """Schema check of an eval output tree against the reference's
    artifact set."""
    missing = [f for f in ARTIFACT_SCHEMA["run_files"]
               if not os.path.exists(join(out_dir, f))]
    report = {"missing_run_files": missing}
    mr = join(out_dir, "mean_results.json")
    if os.path.exists(mr):
        with open(mr) as f:
            mean_results = json.load(f)
        bad = {k: [s for s in ARTIFACT_SCHEMA["mean_results_stats"]
                   if s not in v]
               for k, v in mean_results.items()}
        report["mean_results_keys"] = sorted(mean_results)
        report["missing_stats"] = {k: v for k, v in bad.items() if v}
    return report


def run_reference_protocol(data_root, workdir, reference_dir,
                           data_ratio=0.05, epochs=2):
    """Run the reference recipe on both frameworks and diff results."""
    try:
        import pytorch_lightning  # noqa: F401
        import medpy  # noqa: F401
    except ImportError as exc:
        print(f"reference mode needs the reference's deps: {exc}")
        return {"mode": "reference", "pass": None,
                "error": f"missing dependency: {exc}"}

    flags = ["--data-ratio", str(data_ratio), "--epochs", str(epochs),
             "--model", "FPN", "--crop", "relative_2d_max",
             "--training-dataset", "hrf_fusion",
             "--fusion-modality", "slo", "--multiplier", "2"]
    runs = {}
    for tag, cwd, script in (
            ("reference", reference_dir, "train.py"),
            ("tpu", str(REPO), "train.py")):
        cmd = [sys.executable, script] + flags
        print("+", " ".join(cmd), f"(cwd={cwd})")
        proc = subprocess.run(cmd, cwd=cwd, capture_output=True,
                              text=True)
        runs[tag] = {"rc": proc.returncode,
                     "tail": proc.stdout[-2000:] + proc.stderr[-1000:]}
    # eval + diff is only meaningful when both trainings finished
    report = {"mode": "reference", "train_runs": runs,
              "pass": all(r["rc"] == 0 for r in runs.values())}
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["oracle", "reference"],
                    default="oracle")
    ap.add_argument("--data-root", default=None,
                    help="HRF tree (reference README layout); synthetic "
                         "data is generated when omitted (oracle mode).")
    ap.add_argument("--workdir", default="./__parity")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--channels", default="2,4,8,16,32")
    ap.add_argument("--fp32", action="store_true",
                    help="run the oracle protocol in fp32 (noisier; "
                         "f64 isolates update-rule bugs from reduction "
                         "noise)")
    ap.add_argument("--reference-dir", default="/root/reference")
    args = ap.parse_args()

    if args.mode == "oracle":
        channels = tuple(int(c) for c in args.channels.split(","))
        report = run_oracle_protocol(args.data_root, args.workdir,
                                     steps=args.steps, channels=channels,
                                     f64=not args.fp32)
    else:
        report = run_reference_protocol(args.data_root, args.workdir,
                                        args.reference_dir)

    os.makedirs(args.workdir, exist_ok=True)
    out = join(args.workdir, "parity_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("trajectory", "per_image",
                                   "train_runs")}, indent=2))
    print("report:", out)
    if report["pass"] is None:
        sys.exit(2)
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
