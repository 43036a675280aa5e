"""Deterministic run-directory naming.

Behavioral parity with ``/root/reference/utils.py:107-154``: the training
and evaluation entry points derive the experiment directory from the flag
set, so reruns are idempotent and eval finds the checkpoints written by
training without any extra bookkeeping.
"""

import os
from os.path import join
from pathlib import Path


def get_model_path(config, split_path, idx=None, return_split_name=False):
    model_path = os.path.join(config.models_path, config.training_dataset)

    if config.training_dataset == "vrc" and config.mask_variant != "vs_proj":
        model_path = model_path + "_" + config.mask_variant

    split_name = Path(split_path).stem
    model_path = join(model_path, split_name)

    if config.multiplier != 20:
        ratio_mul = "{}_mul-{}".format(config.data_ratio, config.multiplier)
    else:
        ratio_mul = "{}".format(config.data_ratio)
    model_path = join(model_path, ratio_mul)

    if idx is not None:
        model_path = os.path.join(model_path, str(idx))

    model_name = config.model
    if config.epochs != 40:
        model_name += "_" + str(config.epochs)
    if not config.legacy_path:
        if config.learning_rate != 0.01:
            model_name += "_" + str(config.learning_rate)
    if config.crop is not None:
        model_name += "_" + str(config.crop)
    if config.fusion_modality is not None and config.use_complementary:
        model_name += "-" + config.fusion_modality
    if config.model_weights is not None:
        weights = Path(config.model_weights).stem
        if weights == "last":
            weights = Path(config.model_weights).parent.stem + ".ckpt"
        model_name += "__" + weights
    if config.suffix is not None and config.suffix != "":
        if config.legacy_path:
            model_name += config.suffix
        else:
            model_name += "-" + config.suffix
    model_path = join(model_path, model_name)
    if return_split_name:
        return model_path, split_name
    return model_path
