"""Ensemble evaluation harness.

Behavioral parity with ``/root/reference/test_utils.py``: per-image
metrics rows (Dice/BCE/Precision/Recall/HD/HD95 + GA area in mm² from the
voxel spacing), duplicate-ID guard, per-image artifacts (``test.png``,
``test_soft.png``, ``mask.png``, ``info.json``), run-level
``test_output.csv`` + ``results_dict.json`` + ``mean_results.json``
(mean/std/median/q25/q75 — including the reference's 'median'=mean quirk,
``test_utils.py:121-128``) and global pixel metrics.

TPU-native difference: the 5 checkpoint members run as ONE vmapped jitted
forward over stacked parameters (``train.step.make_ensemble_eval_step``)
instead of 5 sequential model calls, and predictions are averaged on
device.
"""

import json
import os
from os.path import join
from typing import Dict, List, Optional

import jax
import numpy as np

from multimodal_fusion_fpn_tpu.data.imageio_utils import imsave
from multimodal_fusion_fpn_tpu.data.loader import DataLoader
from multimodal_fusion_fpn_tpu.eval.noise import noise_classes
from multimodal_fusion_fpn_tpu.train.step import (make_ensemble_eval_step,
                                                  model_batch)


def average_outputs(outputs: List[Dict]) -> Dict:
    """Recursive mean of a list of prediction dicts (host-side fallback;
    the device path averages inside the jitted ensemble step)."""
    keys = outputs[0].keys()
    out = {}
    for key in keys:
        vals = [o[key] for o in outputs]
        if isinstance(vals[0], dict):
            out[key] = average_outputs(vals)
        elif isinstance(vals[0], str):
            out[key] = vals[0]
        else:
            out[key] = sum(vals) / len(vals)
    return out


def stack_ensemble(trees: List[Dict]) -> Dict:
    """Stack N parameter trees along a new leading axis for vmap."""
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *trees)


def compute_metrics(all_outputs, output, batch, metrics_val, results,
                    results_dict, output_path, save_data: bool = True):
    metrics_row = {}

    output_np = np.asarray(output["prediction"])
    mask_np = np.asarray(batch["mask"])
    all_outputs["pred"] = np.concatenate(
        (all_outputs["pred"], output_np[0, 0].flatten()))
    all_outputs["gt"] = np.concatenate(
        (all_outputs["gt"], mask_np[0, 0].flatten()))

    for c in ("VRCPatId", "FileSetId"):
        if c in batch:
            v = batch[c]
            metrics_row[c] = v[0] if isinstance(v, (list, np.ndarray)) else v
    identifier = metrics_row["FileSetId"]

    if "mask" in batch:
        host_out = {"prediction": output_np}
        for k in ("__device_hd__", "__device_hd95__"):
            if k in output:  # fused on-device Hausdorff values
                host_out[k] = output[k]
        for m, metric in metrics_val.items():
            metrics_row[m] = float(
                np.asarray(metric.calculate_batch(batch, host_out)).item())

    if identifier in results_dict:
        raise ValueError("Identifier already in results_dict")
    try:
        results_dict[identifier] = metrics_row["Dice"]
    except KeyError:
        results_dict[identifier] = metrics_row.get("WeightedL1")

    mask_crop = mask_np[0, 0]
    output_crop = output_np[0, 0]

    if "spacing" in batch:
        spacing = np.asarray(batch["spacing"][0])
        metrics_row["Area"] = float(
            (output_crop > 0.5).sum() * spacing[0] * spacing[2])
        if "mask" in batch:
            metrics_row["Area_manual"] = float(
                (mask_crop > 0.5).sum() * spacing[0] * spacing[2])
            metrics_row["Area_diff"] = (metrics_row["Area"]
                                        - metrics_row["Area_manual"])

    if not save_data:
        results.append(metrics_row)
        print(metrics_row)
        return

    sample_output_path = os.path.join(output_path, identifier)
    os.makedirs(sample_output_path, exist_ok=True)

    if "out_features" in output:
        feats = np.asarray(output["out_features"])[0]
        half = feats.shape[0] // 2
        f0 = feats[:half, :, 0, :].mean(axis=0)
        f1 = feats[half:, :, 0, :].mean(axis=0)
        combined = np.concatenate((f0, f1), axis=1)
        from multimodal_fusion_fpn_tpu.ops.resize import resize
        combined = resize(combined, (256, 512), order=1,
                          anti_aliasing=False)
        try:
            imsave(os.path.join(sample_output_path, "features.png"),
                   (255 * (combined - combined.min())
                    / (np.ptp(combined) + 1e-8)).astype(np.uint8))
        except ValueError:
            print("Error saving features", combined.shape)

    with open(join(sample_output_path, "info.json"), "w") as fp:
        json.dump(metrics_row, fp, indent=4)

    imsave(os.path.join(sample_output_path, "test.png"),
           ((output_crop[:, 0, :] > 0.5) * 255).astype(np.uint8))
    imsave(os.path.join(sample_output_path, "test_soft.png"),
           (np.clip(output_crop[:, 0, :], 0, 1) * 255).astype(np.uint8))
    mask_path = os.path.join(sample_output_path, "mask.png")
    if not os.path.exists(mask_path):
        imsave(mask_path,
               (np.clip(mask_crop[:, 0, :], 0, 1) * 255).astype(np.uint8))

    results.append(metrics_row)
    print(metrics_row)


def create_val_dataloader(opt, val_ids, data_transform_val,
                          num_workers: int = 8) -> DataLoader:
    val_data = opt.val_data(val_ids, data_transform_val=data_transform_val)
    return DataLoader(val_data, batch_size=1, shuffle=False,
                      drop_last=False, num_workers=num_workers,
                      transform_rng=False)


def _bucket_pad(batch: Dict, bucket: int) -> Dict:
    """Zero-pad the model input volumes so every non-singleton spatial
    dim is a multiple of ``bucket`` — bounds the set of XLA compilations
    for whole-volume eval (RelFit emits per-image shapes) — and attach
    the TRUE extents as the reserved "__valid_*__" keys.

    All four seg families (FPN, FPNHybridFusion, FPN2D, FPNLateFusion
    and their Regression variants) consume the keys and evaluate
    EXACTLY: every conv/BN output is re-masked and the size-dependent
    ops (pool extents, projection depth means, the 2D->3D/feature
    alignments, FPN2D's final mask-shape resize) compute over the true
    extents (tests/test_exact_bucketing.py proves equality with the
    unbucketed run, model-level and through this function).  The
    prediction is cropped back before metrics either way."""
    out = dict(batch)
    for k in ("image", "slo", "faf"):
        v = out.get(k)
        if v is None or not hasattr(v, "shape") or v.ndim != 5:
            continue
        pads = [(0, 0)] * 5
        for d in (2, 3, 4):
            n = v.shape[d]
            if n > 1:
                # small extents (the B-scan axis, tens) use a finer
                # bucket so the relative padding stays bounded.
                b = bucket if n >= 4 * bucket // 2 else max(16, bucket // 4)
                tgt = -(-n // b) * b
                pads[d] = (0, tgt - n)
        if any(p != (0, 0) for p in pads):
            if k == "image":
                out["__valid_image__"] = np.asarray(
                    v.shape[2:5], np.int32)
            else:
                out["__valid_enface__"] = np.asarray(
                    (v.shape[2], v.shape[4]), np.int32)
            out[k] = np.pad(np.asarray(v), pads)
    return out


def run_evaluation_instance(opt, all_outputs, val_ids, data_transform_val,
                            model, member_trees: List[Dict],
                            metrics_val, results, results_dict, output_path,
                            noise: Optional[str] = None,
                            debug_images: bool = False,
                            noise_seed: int = 1234,
                            shape_bucket: int = 0,
                            eval_batch: int = 1):
    """Evaluate the ensemble defined by ``member_trees`` (list of
    {'params':..., 'batch_stats':...}) over the validation ids.

    ``eval_batch`` > 1 groups images of IDENTICAL true shape into one
    dispatch (round-5 on-chip isolation: B=4 + bf16 runs the 5-member
    whole-volume ensemble ~6x faster per image than B=1 fp32 —
    results/onchip_r5.jsonl eval_iso_*).  Only same-true-shape images
    share a dispatch: the exact-bucketing extents are per-dispatch
    scalars, so mixing extents would break bit-exactness.  Metrics,
    artifacts and CSV rows stay per-image and order-preserving."""
    loader = create_val_dataloader(opt, val_ids, data_transform_val)

    stacked_params = stack_ensemble([t["params"] for t in member_trees])
    stacked_bs = stack_ensemble([t["batch_stats"] for t in member_trees])
    # Fuse the on-device Hausdorff/HD95 into the eval jit when any HD
    # metric opted into the device path (one dispatch + one fetch per
    # image; per-sample host dispatch pays ~27 ms/fetch on axon).
    use_hd_device = any(getattr(m, "device", False)
                        for m in metrics_val.values())
    ensemble_step = make_ensemble_eval_step(model, with_hd=use_hd_device)

    noise_fn = None
    modality_to_noise = None
    if noise is not None:
        modality_to_noise, noise_type, noise_level = noise.split("-")
        noise_fn = noise_classes[noise_type](float(noise_level),
                                             seed=noise_seed)

    if debug_images:
        from pathlib import Path
        Path(join(output_path, "__images")).mkdir(parents=True,
                                                  exist_ok=True)

    def _emit(batch, output, true_yx):
        """Per-image tail: crop to the true extent, artifacts, metrics."""
        if shape_bucket and output["prediction"].ndim == 5:
            output["prediction"] = \
                output["prediction"][:, :, :true_yx[0], :, :true_yx[1]]

        if debug_images:
            from multimodal_fusion_fpn_tpu.viz import debug_batch
            dbg = dict(batch)
            dbg["prediction"] = output["prediction"]
            try:
                debug_batch(dbg, join(output_path, "__images"),
                            name_hint=batch["FileSetId"][0])
            except Exception as exc:
                print("debug_batch failed:", exc)

        compute_metrics(all_outputs, output, batch, metrics_val, results,
                        results_dict, output_path, opt.save_data)

    pending = []  # (batch, model_in, true_yx, spacing) awaiting dispatch

    def _flush():
        if not pending:
            return
        # __valid_*__ extents are per-DISPATCH (identical within a
        # group by the same-true-shape key) — never concatenated
        group = {k: pending[0][1][k] if k.startswith("__valid_")
                 or getattr(pending[0][1][k], "ndim", 0) < 1
                 else np.concatenate([p[1][k] for p in pending], axis=0)
                 for k in pending[0][1]}
        if use_hd_device:
            sps = np.stack([p[3] for p in pending])
            out = ensemble_step(stacked_params, stacked_bs, group,
                                sps if len(pending) > 1 else sps[0])
        else:
            out = ensemble_step(stacked_params, stacked_bs, group)
        out = {k: np.asarray(v) for k, v in out.items()}
        nb_ = len(pending)
        for i, (batch, _mi, true_yx, _sp) in enumerate(pending):
            per = {}
            for k, v in out.items():
                if k in ("__device_hd__", "__device_hd95__"):
                    per[k] = v if v.ndim == 0 else v[i]
                elif getattr(v, "ndim", 0) >= 1 and v.shape[0] == nb_:
                    per[k] = v[i:i + 1]
                else:
                    per[k] = v
            _emit(batch, per, true_yx)
        pending.clear()

    group_key = None
    for batch in loader:
        if noise_fn is not None:
            batch[modality_to_noise] = noise_fn(batch[modality_to_noise])

        model_in = model_batch(batch)
        true_yx = None
        if shape_bucket:
            # metrics run against the (never padded) mask, so its shape
            # is the true prediction extent; fall back to the volume's
            # for mask-less batches.  (The image key alone is wrong for
            # comp-only configs, where it is Disabled to a singleton.)
            ref_arr = batch.get("mask", batch.get("image"))
            true_yx = (ref_arr.shape[2], ref_arr.shape[4])
            model_in = _bucket_pad(model_in, shape_bucket)
        sp = (np.asarray(batch["spacing"][0], np.float32)[[0, 2]]
              if "spacing" in batch else np.ones(2, np.float32))

        # only identical TRUE shapes share a dispatch (the dynamic
        # extents are per-dispatch scalars)
        key = tuple(sorted(
            (k, tuple(np.shape(v))) for k, v in batch.items()
            if isinstance(v, np.ndarray)))
        if pending and (key != group_key or len(pending) >= eval_batch):
            _flush()
        group_key = key
        pending.append((batch, model_in, true_yx, sp))
        if len(pending) >= max(1, eval_batch):
            _flush()
    _flush()


def get_final_results_only(output_path, metrics_val, df_results):
    mean_results = {}
    for k in metrics_val.keys():
        mean_results[k] = {
            "mean": df_results[k].mean(),
            "std": df_results[k].std(),
            # parity quirk: the reference stores the mean under 'median'
            # (test_utils.py:124)
            "median": df_results[k].mean(),
            "q25": df_results[k].quantile(0.25),
            "q75": df_results[k].quantile(0.75),
        }
        print("Mean {}: {} std {} Median {} Q25 {} Q75 {}".format(
            k, df_results[k].mean(), df_results[k].std(),
            df_results[k].median(), df_results[k].quantile(0.25),
            df_results[k].quantile(0.75)))
    with open(os.path.join(output_path, "mean_results.json"), "w") as fp:
        json.dump(mean_results, fp, indent=4)


def compute_global_metrics(global_metrics, all_outputs, output_path):
    print("\nGlobal metrics:")
    gm_results = {}
    for gm in global_metrics:
        m_value = global_metrics[gm].calculate(all_outputs["gt"],
                                               all_outputs["pred"])
        print(f"{gm}: {m_value}")
        gm_results[gm] = float(m_value)
    with open(join(output_path, "global_metrics.json"), "w") as fp:
        json.dump(gm_results, fp, indent=4)


def get_mean_results(opt, all_outputs, results, results_dict, output_path):
    import pandas as pd
    df_results = pd.DataFrame(results)
    results_file = os.path.join(output_path, "test_output.csv")
    df_results.to_csv(results_file)
    with open(os.path.join(output_path, "results_dict.json"), "w") as fp:
        json.dump(results_dict, fp, indent=4)

    df_results = pd.read_csv(results_file, index_col=0)
    get_final_results_only(output_path, opt.metrics_val, df_results)
    compute_global_metrics(opt.global_metrics, all_outputs, output_path)
