#!/usr/bin/env python3
"""Ensemble evaluation entry point.

CLI-compatible with the reference ``/root/reference/validate_ensemble.py``:
extends the training parser with the 10 eval flags, seeds
``1234 + repetition``, derives the output path (including cross-dataset
``A-to-B`` and cross-split ``s1-to-s2`` renaming), skips when results
exist, loads exactly 5 top-k checkpoints, and writes the full artifact
set (per-image PNGs/info.json, test_output.csv, results_dict.json,
mean_results.json, global_metrics.json, optional all_outputs.npz).

TPU-native: the 5 models run as one vmapped stacked-params forward.
"""

import glob
import json
import os
import sys
from os.path import join
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_fusion_fpn_tpu import paths as path_utils
from multimodal_fusion_fpn_tpu.config import build_parser, derive, pretty_print
from multimodal_fusion_fpn_tpu.eval.configs import opt_factory
from multimodal_fusion_fpn_tpu.eval.harness import (create_val_dataloader,
                                                    get_mean_results,
                                                    run_evaluation_instance)
from multimodal_fusion_fpn_tpu.models.zoo import build_model
from multimodal_fusion_fpn_tpu.train.checkpoints import load_checkpoint
from multimodal_fusion_fpn_tpu.train.configs import data_config_factory
from multimodal_fusion_fpn_tpu.train.state import create_train_state
from multimodal_fusion_fpn_tpu.train.step import model_batch
from multimodal_fusion_fpn_tpu.train.optim import sgd


def extend_parser(parser):
    parser.add_argument("--noise", type=str, default=None,
                        help="Noise applied to one modality. "
                             "Format: <modality>-<noise_type>")
    parser.add_argument("--noise-level", type=float, default=None)
    parser.add_argument("--debug-images", action="store_true")
    parser.add_argument("--test-dataset", type=str, default=None)
    parser.add_argument("--eval-split", type=str, default=None)
    parser.add_argument("--save-all-outputs", action="store_true")
    parser.add_argument("--force-repeat", action="store_true")
    parser.add_argument("--dont-save", action="store_true")
    parser.add_argument("--eval-mask-variant", type=str, default=None)
    parser.add_argument("--repetition", type=int, default=-1)
    parser.add_argument(
        "--output-features", action="store_true",
        help="Emit pre-fusion branch features from the late-fusion models "
             "(saved as features.png per image; the reference sketches "
             "this path in fusion_nets.py:206-212 / test_utils.py:215).")
    parser.add_argument(
        "--eval-shape-bucket", type=int, default=64,
        help="Pad eval volumes to multiples of this bucket so N "
             "distinct RelFit shapes hit a bounded set of XLA "
             "compilations (0 = off: every shape compiles its own "
             "graph — on axon that is a minutes-long remote compile "
             "PER DISTINCT SHAPE).  EXACT for all four seg families "
             "(FPN / FPNHybridFusion / FPN2D / FPNLateFusion + "
             "Regression variants): the true extents travel as dynamic "
             "scalars and the padded run reproduces the unpadded "
             "prediction bit-for-bit on the valid region "
             "(tests/test_exact_bucketing.py, incl. an end-to-end "
             "harness check).  Default 64 since round 4.")
    parser.add_argument(
        "--eval-batch", type=int, default=1,
        help="Group images of identical true shape into one ensemble "
             "dispatch (per-image metrics/artifacts unchanged).  "
             "Round-5 on-chip isolation: 4 with --precision bf16 runs "
             "the 5-member whole-volume ensemble ~6x faster per image "
             "than the per-image fp32 loop.")
    return parser


def run(argv=None):
    parser = extend_parser(build_parser())
    args = parser.parse_args(argv)
    config = derive(args)
    print(pretty_print(config))

    if args.test_dataset is None:
        args.test_dataset = args.training_dataset

    opt = opt_factory[args.test_dataset](config)

    if args.noise is not None:
        assert args.noise_level is not None
        args.noise = f"{args.noise}-{args.noise_level}"
    noise_dir = args.noise if args.noise is not None else "no-noise"

    seed = 1234 + args.repetition
    np.random.seed(seed)

    opt.results_path = "./__test/"

    if args.eval_split is None:
        if args.split_name is not None:
            args.eval_split = args.split_name
            eval_split_fn = join(opt.paths["oct"], args.eval_split)
        else:
            args.eval_split = opt.paths["split"]
            eval_split_fn = args.eval_split
    else:
        eval_split_fn = join(opt.paths["oct"], args.eval_split)
    if not eval_split_fn.endswith(".json"):
        eval_split_fn += ".json"
    eval_split_name = Path(eval_split_fn).stem

    print("Using split:", eval_split_fn)
    with open(eval_split_fn, "r") as f:
        eval_split = json.load(f)

    if args.dont_save:
        opt.save_data = False
    if args.eval_mask_variant is not None:
        opt.mask_variant = args.eval_mask_variant

    print(opt)

    all_outputs = {"pred": np.array([]), "gt": np.array([])}

    test_name = config.training_dataset if \
        config.training_dataset == args.test_dataset else \
        f"{config.training_dataset}-to-{args.test_dataset}"

    data_transform_val = opt.get_val_transforms()

    if args.split_name is not None:
        training_split = join(opt.paths["oct"], args.split_name)
    else:
        dc_cls = data_config_factory[config.training_dataset]
        training_split = dc_cls(config).paths["split"]

    current_model_path, training_split_name = path_utils.get_model_path(
        config, training_split, None, True)
    print("Current model path:", current_model_path)
    assert os.path.exists(current_model_path), current_model_path

    output_path = opt.results_path
    if args.noise is not None:
        output_path = join(output_path, noise_dir)
    if args.repetition >= 0:
        output_path = join(output_path, f"rep_{args.repetition}")
    # Relative run path under the training root, with the train dataset
    # renamed to '<train>-to-<test>' (reference validate_ensemble.py:185-191).
    rel = os.path.relpath(current_model_path, config.models_path)
    output_path = os.path.join(
        output_path, rel.replace(config.training_dataset, test_name))
    if training_split_name != eval_split_name:
        repl = "{}-to-{}".format(training_split_name, eval_split_name)
        if args.eval_mask_variant is not None:
            repl += "--" + args.eval_mask_variant
        output_path = output_path.replace(training_split_name, repl)
    print("\n>>> Output path: {}\n".format(output_path))

    if args.save_all_outputs:
        if os.path.exists(join(output_path, "all_outputs.npz")) \
                and not args.force_repeat:
            print("All outputs file already exists. Skipping.")
            sys.exit(0)
    elif os.path.exists(join(output_path, "mean_results.json")) \
            and not args.force_repeat:
        print("Results file already exists. Skipping.")
        sys.exit(0)

    Path(join(output_path, "__images")).mkdir(parents=True, exist_ok=True)

    model_paths = glob.glob(join(current_model_path, "epoch=*.ckpt"))
    print("Model paths ({}): {}".format(len(model_paths), model_paths))
    assert len(model_paths) == 5, model_paths

    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    model = build_model(config, dtype=dtype)

    if isinstance(eval_split, list):
        val_ids = {"ids": eval_split}
    elif isinstance(eval_split, dict):
        val_ids = eval_split["test"]
    else:
        raise ValueError("Unknown split data type")

    if config.exec_test:
        print("Skipping. exec_test is True.")
        sys.exit(0)

    # Template for deserialization: init once on an example batch.
    probe_loader = create_val_dataloader(opt, val_ids, data_transform_val,
                                         num_workers=0)
    example = model_batch(next(iter(probe_loader)))
    template_state = create_train_state(model, sgd(0.1),
                                        jax.random.PRNGKey(0), example)
    template = {"params": template_state.params,
                "batch_stats": template_state.batch_stats}

    member_trees = []
    for path_weights in sorted(model_paths):
        print(f"Loading weights from {path_weights}")
        member_trees.append(load_checkpoint(path_weights, template))

    results = []
    results_dict = {}
    run_evaluation_instance(
        opt, all_outputs, val_ids, data_transform_val, model, member_trees,
        opt.metrics_val, results, results_dict, output_path,
        noise=args.noise, debug_images=args.debug_images, noise_seed=seed,
        shape_bucket=args.eval_shape_bucket,
        eval_batch=args.eval_batch)

    get_mean_results(opt, all_outputs, results, results_dict, output_path)

    if args.save_all_outputs:
        assert all_outputs["pred"].shape == all_outputs["gt"].shape
        np.savez_compressed(join(output_path, "all_outputs.npz"),
                            pred=all_outputs["pred"],
                            gt=all_outputs["gt"])


if __name__ == "__main__":
    run()
