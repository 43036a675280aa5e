#!/usr/bin/env python3
"""Training entry point.

CLI-compatible with the reference ``/root/reference/train.py`` (the
canonical ``run.sh`` recipe works unchanged): split resolution with
``--split-name`` override and cross-validation over ``--split-indices``,
deterministic run-path naming, skip-if-``last.ckpt``, data-ratio
truncation, SGD(momentum 0.9, wd 1e-4), top-5-by-Dice checkpoints,
optional early stopping, ``--exec-test`` graph-build smoke mode, and a
terminal ``last.ckpt``.
"""

import json
import os
import shutil
import sys
from os.path import join
from pathlib import Path

import jax
import numpy as np

from multimodal_fusion_fpn_tpu import paths as path_utils
from multimodal_fusion_fpn_tpu.config import parse_config, pretty_print
from multimodal_fusion_fpn_tpu.data.loader import DataLoader
from multimodal_fusion_fpn_tpu.models.zoo import build_model
from multimodal_fusion_fpn_tpu.train.checkpoints import (load_checkpoint,
                                                         save_checkpoint)
from multimodal_fusion_fpn_tpu.train.configs import data_config_factory
from multimodal_fusion_fpn_tpu.train.optim import sgd
from multimodal_fusion_fpn_tpu.train.state import create_train_state
from multimodal_fusion_fpn_tpu.train.step import model_batch
from multimodal_fusion_fpn_tpu.train.trainer import Trainer
from multimodal_fusion_fpn_tpu.utils import print_net_info

import jax.numpy as jnp


def main(config, data_config, model_path, training_file_list,
         validation_file_list):
    print(model_path)
    print("jax", jax.__version__, "devices", jax.devices())

    print("===> Building model")
    dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    model = build_model(config, dtype=dtype)

    print("===> Loading datasets")
    print("Train data:", data_config.paths["oct"])
    data_transform, data_transform_val = data_config.get_transforms()
    train_data = data_config.train_data(training_file_list, data_transform)
    val_data = data_config.val_data(validation_file_list, data_transform_val)

    batch_size = config.batch_size or data_config.batch_size
    train_loader = DataLoader(train_data, batch_size=batch_size,
                              shuffle=True, drop_last=True,
                              num_workers=config.threads, seed=config.seed)
    val_loader = DataLoader(val_data, batch_size=config.val_batch_size,
                            shuffle=False, drop_last=False,
                            num_workers=min(2, config.threads),
                            seed=config.seed, transform_rng=False)

    criterion = data_config.get_criterion()
    tx = sgd(config.learning_rate, momentum=0.9, weight_decay=1e-4)

    # Initialize from an example batch (defines all shapes/params).
    example = model_batch(next(iter(train_loader)))
    rng = jax.random.PRNGKey(config.seed)
    state = create_train_state(model, tx, rng, example)
    print_net_info(state.params)

    mesh = None
    n_dev = len(jax.devices())
    if config.mesh or (n_dev > 1 and batch_size % n_dev == 0):
        from multimodal_fusion_fpn_tpu.parallel.mesh import (make_mesh,
                                                             shard_state)
        mesh = make_mesh(config.mesh)
        print("Device mesh:", dict(zip(mesh.axis_names,
                                       mesh.devices.shape)))
        state = shard_state(state, mesh)

    if config.model_weights is not None:
        print("Loading pretrained model from", config.model_weights)
        tree = load_checkpoint(config.model_weights,
                               {"params": state.params,
                                "batch_stats": state.batch_stats})
        state = state.replace(params=tree["params"],
                              batch_stats=tree["batch_stats"])

    if config.exec_test:
        print(model)
        print("Testing mode enabled. Skipping training.")
        return

    trainer = Trainer(
        model, tx, criterion,
        metrics_train=data_config.metrics_train,
        metrics_val=data_config.metrics_val,
        metametrics=data_config.meta_metric_val,
        model_path=model_path,
        epochs=config.epochs,
        virtual_batch_size=config.virtual_batch_size,
        monitor=data_config.monitor,
        monitor_mode=data_config.monitor_mode,
        early_stopping=config.early_stopping,
        seed=config.seed,
        mesh=mesh, bn_sync=config.bn_sync)

    start_epoch, early_state = 0, None
    resume_path = join(model_path, "resume.ckpt")
    if getattr(config, "resume", False) and Path(resume_path).exists():
        # Exact epoch-boundary resume: restore params/BN/optimizer/step
        # plus the early-stopping ledger; the stateless step RNG and the
        # per-epoch loader reshuffle make the continued trajectory
        # bit-identical to an uninterrupted run (tests/test_resume.py).
        print("Resuming from", resume_path)
        tree = load_checkpoint(resume_path,
                               {"params": state.params,
                                "batch_stats": state.batch_stats,
                                "opt_state": state.opt_state,
                                "step": np.asarray(state.step),
                                "next_epoch": np.asarray(0),
                                "best": np.asarray(0.0),
                                "patience_left": np.asarray(-1)})
        state = state.replace(params=tree["params"],
                              batch_stats=tree["batch_stats"],
                              opt_state=tree["opt_state"],
                              step=jnp.asarray(tree["step"]))
        start_epoch = int(tree["next_epoch"])
        best = float(tree["best"])
        pl = int(tree["patience_left"])
        early_state = {"best": None if np.isnan(best) else best,
                       "patience_left": None if pl < 0 else pl}
        print(f"Resumed at epoch {start_epoch} (step {int(tree['step'])})")

    print("===> Begin training")
    state = trainer.fit(state, train_loader, val_loader,
                        start_epoch=start_epoch, early_state=early_state)

    if trainer.interrupted:
        print("Training interrupted")
    else:
        print("===> Saving last model")
        # last.ckpt also carries the optimizer state and step for exact
        # resume (extension over the reference's weights-only save).
        save_checkpoint(join(model_path, "last.ckpt"),
                        {"params": state.params,
                         "batch_stats": state.batch_stats,
                         "opt_state": state.opt_state,
                         "step": np.asarray(state.step)})
        if Path(resume_path).exists():
            os.remove(resume_path)


def train_with_split(config, data_config, split, idx, split_path):
    model_path = path_utils.get_model_path(config, split_path, idx)
    Path(model_path).mkdir(exist_ok=True, parents=True)
    print(model_path)

    if Path(join(model_path, "last.ckpt")).exists():
        print("Model already trained. Skipping.")
        sys.exit(0)

    if os.path.exists(config.file_to_copy):
        shutil.copy2(config.file_to_copy, model_path)
    Path(join(model_path, "images")).mkdir(exist_ok=True, parents=True)

    train_ids, val_ids = split["train"], split["val"]
    if config.data_ratio < 1.0:
        print("Using only", config.data_ratio * 100,
              "% of the training data.")
        train_ids = train_ids[:int(len(train_ids) * config.data_ratio)]

    print("Number of training samples:", len(train_ids))
    print("Number of validation samples:", len(val_ids))
    main(config, data_config, model_path, train_ids, val_ids)


def run(argv=None):
    config = parse_config(argv)
    print(pretty_print(config))
    np.random.seed(config.seed)

    data_config = data_config_factory[config.training_dataset](config)

    split_name = config.split_name
    if split_name is not None:
        split_parent = Path(data_config.paths["split"]).parent
        if not split_name.endswith(".json"):
            split_name += ".json"
        split_path = str(split_parent / split_name)
        data_config.paths["split"] = split_path
    else:
        split_path = data_config.paths["split"]

    with open(split_path, "r") as fp:
        splits = json.load(fp)
    print("Split:", Path(split_path).stem)

    if isinstance(splits, dict):
        print("Only one split, ignoring split indices."
              " Regular training setting.")
        train_with_split(config, data_config, splits, None, split_path)
    elif isinstance(splits, list):
        print(f"Multiple splits ({len(splits)}), using split indices."
              " Training in a cross-validation setting.")
        for idx, split in enumerate(splits):
            if idx not in config.split_indices:
                continue
            print("Running {} out of {} splits.".format(idx,
                                                        len(splits) - 1))
            train_with_split(config, data_config, split, idx, split_path)


if __name__ == "__main__":
    run()
