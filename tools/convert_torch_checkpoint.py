#!/usr/bin/env python3
"""Convert a reference PyTorch(-Lightning) checkpoint to this framework.

Usage:
    python tools/convert_torch_checkpoint.py \
        --torch-ckpt /path/to/epoch=12-Dice=0.8123.ckpt \
        --out /path/to/out.ckpt \
        --model FPNHybridFusion --crop relative_2d_max \
        --fusion-modality slo --training-dataset hrf_fusion

Builds the target model to obtain the parameter-tree template, maps the
torch state dict through :mod:`train.torch_import` (including the
legacy ``resensenet``→``resensnet`` rename, reference
``validate_ensemble.py:253-256``), and writes a flax msgpack checkpoint
usable by ``--model-weights`` and ``validate_ensemble.py``.
"""

import argparse
import sys

import numpy as np


def main():
    sys.path.insert(0, ".")
    import jax
    from multimodal_fusion_fpn_tpu.config import build_parser, derive
    from multimodal_fusion_fpn_tpu.models.zoo import build_model
    from multimodal_fusion_fpn_tpu.train.checkpoints import save_checkpoint
    from multimodal_fusion_fpn_tpu.train.state import create_train_state
    from multimodal_fusion_fpn_tpu.train.optim import sgd
    from multimodal_fusion_fpn_tpu.train.torch_import import map_state_dict

    parser = build_parser()
    parser.add_argument("--torch-ckpt", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--probe-z", type=int, default=64)
    args = parser.parse_args()
    config = derive(args)

    import torch
    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k.replace("resensenet", "resensnet"): v
                  for k, v in state_dict.items()}

    model = build_model(config)
    rng = np.random.default_rng(0)
    b, y, x, z = 1, 8, 32, args.probe_z
    batch = {
        "image": rng.normal(size=(b, 1, y, z, x)).astype(np.float32),
        "slo": rng.normal(size=(b, 1, 80, 1, x)).astype(np.float32),
        "mask": np.zeros((b, 1, y, 1, x), np.float32),
    }
    template = create_train_state(model, sgd(0.1), jax.random.PRNGKey(0),
                                  batch)
    params, batch_stats = map_state_dict(state_dict, template.params,
                                         template.batch_stats)
    save_checkpoint(args.out, {"params": params,
                               "batch_stats": batch_stats})
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
