"""Checkpointing: top-k-by-monitor retention plus a terminal checkpoint.

Behavioral parity with the reference's Lightning ``ModelCheckpoint``
(``/root/reference/train.py:106-113``): keeps the top-5 checkpoints by the
monitored validation metric ('Dice', mode 'max'), weights-only, with
filenames ``epoch={e}-{monitor}={value:.4f}.ckpt`` that the ensemble
evaluator globs as ``epoch=*.ckpt`` (``validate_ensemble.py:221-224``),
and a terminal ``last.ckpt`` (``train.py:188``).

Format: flax msgpack of ``{'params': ..., 'batch_stats': ...}`` (plus the
optimizer state in ``last.ckpt`` for exact resume — an extension over the
reference, which saves weights only).
"""

import glob
import os
from os.path import join
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Dict[str, Any]) -> None:
    # to_state_dict converts tuples / optax states into plain dicts that
    # msgpack can serialize.
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(tree)))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if template is None:
        return raw
    # Tolerate extra top-level entries (e.g. optimizer state in
    # last.ckpt) when the caller only wants the weights.
    if isinstance(template, dict) and isinstance(raw, dict):
        raw = {k: v for k, v in raw.items() if k in template}
    return serialization.from_state_dict(template, raw)


class TopKCheckpointer:
    def __init__(self, dirpath: str, monitor: str = "Dice",
                 mode: str = "max", save_top_k: int = 5):
        self.dirpath = dirpath
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.saved: List[Tuple[float, str]] = []
        os.makedirs(dirpath, exist_ok=True)

    def _better(self, a: float, b: float) -> bool:
        return a > b if self.mode == "max" else a < b

    def restore(self) -> int:
        """Rebuild the top-k ledger from checkpoints already on disk
        (exact resume): filenames carry (epoch, monitor value)."""
        self.saved = []
        pat = join(self.dirpath, f"epoch=*-{self.monitor}=*.ckpt")
        for path in sorted(glob.glob(pat)):
            stem = os.path.basename(path)[:-len(".ckpt")]
            try:
                value = float(stem.split(f"{self.monitor}=")[1])
            except (IndexError, ValueError):
                continue
            self.saved.append((value, path))
        # A crash between update()'s save and its prune can leave k+1
        # files on disk; carrying the oversized ledger forward would
        # permanently retain the extra (update() only replaces in
        # place once the ledger is full).  Prune back to top-k here.
        if len(self.saved) > self.save_top_k:
            self.saved.sort(key=lambda t: t[0],
                            reverse=(self.mode == "max"))
            for _value, path in self.saved[self.save_top_k:]:
                if os.path.exists(path):
                    os.remove(path)
            self.saved = self.saved[:self.save_top_k]
        return len(self.saved)

    def update(self, epoch: int, value: float,
               tree: Dict[str, Any]) -> Optional[str]:
        """Maybe save a checkpoint for this epoch; prune beyond top-k."""
        if np.isnan(value):
            return None
        filename = f"epoch={epoch}-{self.monitor}={value:.4f}.ckpt"
        path = join(self.dirpath, filename)
        if len(self.saved) < self.save_top_k:
            save_checkpoint(path, tree)
            self.saved.append((value, path))
            return path
        worst_idx = min(range(len(self.saved)),
                        key=lambda i: self.saved[i][0] if self.mode == "max"
                        else -self.saved[i][0])
        worst_value, worst_path = self.saved[worst_idx]
        if self._better(value, worst_value):
            save_checkpoint(path, tree)
            if os.path.exists(worst_path):
                os.remove(worst_path)
            self.saved[worst_idx] = (value, path)
            return path
        return None


def find_topk_checkpoints(model_dir: str) -> List[str]:
    return sorted(glob.glob(join(model_dir, "epoch=*.ckpt")))


def import_torch_checkpoint(path: str, params_template,
                            batch_stats_template):
    """Import a PyTorch-Lightning checkpoint from the reference codebase.

    Maps the reference's ``state_dict`` names (``model.resensnet.conv1.0.
    convBlock.0.0.weight`` …) onto this framework's parameter tree for
    logit-parity validation.  Conv kernels are transposed from torch
    OIDHW/OIHW to channels-last DHWIO/HWIO.
    """
    import torch
    ckpt = torch.load(path, map_location="cpu")
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k.replace("resensenet", "resensnet"): v
                  for k, v in state_dict.items()}
    from multimodal_fusion_fpn_tpu.train.torch_import import map_state_dict
    return map_state_dict(state_dict, params_template, batch_stats_template)
