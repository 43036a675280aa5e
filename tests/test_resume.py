"""Exact epoch-boundary resume (VERDICT r3 item 6).

The reference's restart story is skip-if-``last.ckpt`` (restart whole
runs, ``/root/reference/train.py:200-202``); this framework extends it
with ``--resume``: ``resume.ckpt`` (params, BN stats, optimizer state,
step, early-stopping ledger) written at every epoch boundary, consumed
by train.py.  Exactness contract: interrupt after epoch k, resume, and
the final state is BIT-IDENTICAL to the uninterrupted run — possible
because the step RNG is stateless (PRNGKey(seed) folded with
epoch/step) and the loader reshuffles deterministically per epoch.
"""

import os
from os.path import join

import jax
import numpy as np

from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.losses import Mix, bce_loss, dice_loss_joint
from multimodal_fusion_fpn_tpu.models.zoo import build_model
from multimodal_fusion_fpn_tpu.train.checkpoints import load_checkpoint
from multimodal_fusion_fpn_tpu.train.optim import sgd
from multimodal_fusion_fpn_tpu.train.state import create_train_state
from multimodal_fusion_fpn_tpu.train.step import model_batch
from multimodal_fusion_fpn_tpu.train.trainer import Trainer


class _Loader:
    """Deterministic per-epoch batches (stands in for the seeded
    shuffling DataLoader: same epoch -> same batch order)."""

    def __init__(self, n_batches=2, b=2):
        self.n_batches = n_batches
        self.b = b
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        for i in range(self.n_batches):
            rng = np.random.default_rng(1000 * self.epoch + i)
            yield {
                "slo": rng.normal(
                    size=(self.b, 1, 16, 1, 16)).astype(np.float32),
                "mask": (rng.random((self.b, 1, 16, 1, 16)) > 0.5
                         ).astype(np.float32),
            }


def _make(tmp_path, tiny_spec, epochs, subdir):
    cfg = make_config(model="FPN2D", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=tiny_spec, remat=False)
    criterion = Mix({"d": dice_loss_joint(), "b": bce_loss()})
    tx = sgd(0.1, momentum=0.9, weight_decay=1e-4)
    path = str(tmp_path / subdir)
    os.makedirs(path, exist_ok=True)
    trainer = Trainer(model, tx, criterion, {}, {}, {}, path,
                      epochs=epochs, save_debug_images=False,
                      early_stopping=None)
    example = model_batch(next(iter(_Loader())))
    state = create_train_state(model, tx, jax.random.PRNGKey(1234),
                               example)
    return trainer, state, path


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_resume_bit_identical(tmp_path, tiny_spec):
    # uninterrupted 3-epoch run
    tr_a, st_a, _ = _make(tmp_path, tiny_spec, epochs=3, subdir="a")
    final_a = tr_a.fit(st_a, _Loader(), _Loader(n_batches=1))

    # interrupted: 2 epochs, then resume for the 3rd from resume.ckpt
    tr_b, st_b, path_b = _make(tmp_path, tiny_spec, epochs=2, subdir="b")
    mid_b = tr_b.fit(st_b, _Loader(), _Loader(n_batches=1))
    resume_path = join(path_b, "resume.ckpt")
    assert os.path.exists(resume_path)

    tr_c, st_c, _ = _make(tmp_path, tiny_spec, epochs=3, subdir="b")
    tree = load_checkpoint(resume_path,
                           {"params": st_c.params,
                            "batch_stats": st_c.batch_stats,
                            "opt_state": st_c.opt_state,
                            "step": np.asarray(st_c.step),
                            "next_epoch": np.asarray(0),
                            "best": np.asarray(0.0),
                            "patience_left": np.asarray(-1)})
    assert int(tree["next_epoch"]) == 2
    st_c = st_c.replace(params=tree["params"],
                        batch_stats=tree["batch_stats"],
                        opt_state=tree["opt_state"],
                        step=np.asarray(tree["step"]))
    final_c = tr_c.fit(st_c, _Loader(), _Loader(n_batches=1),
                       start_epoch=int(tree["next_epoch"]))

    for a, c in zip(_leaves({"p": final_a.params,
                             "bn": final_a.batch_stats,
                             "opt": final_a.opt_state}),
                    _leaves({"p": final_c.params,
                             "bn": final_c.batch_stats,
                             "opt": final_c.opt_state})):
        np.testing.assert_array_equal(a, c)
    assert int(final_a.step) == int(final_c.step)

    # sanity: the mid state differs from the final (training moved)
    moved = any(not np.array_equal(a, b)
                for a, b in zip(_leaves(final_a.params),
                                _leaves(mid_b.params)))
    assert moved


def test_resume_restores_early_stopping_ledger(tmp_path, tiny_spec):
    tr, st, path = _make(tmp_path, tiny_spec, epochs=1, subdir="e")
    tr.early_stopping = 3
    tr.fit(st, _Loader(), _Loader(n_batches=1))
    tree = load_checkpoint(join(path, "resume.ckpt"))
    # monitor is nan (no val metrics) -> improved stays None-best path;
    # the ledger fields round-trip regardless
    assert "best" in tree and "patience_left" in tree
    assert int(np.asarray(tree["next_epoch"])) == 1


def test_topk_restore_rebuilds_ledger(tmp_path):
    from multimodal_fusion_fpn_tpu.train.checkpoints import (
        TopKCheckpointer, save_checkpoint)
    d = str(tmp_path / "ck")
    ck = TopKCheckpointer(d, monitor="Dice", mode="max", save_top_k=2)
    for epoch, v in [(0, 0.5), (1, 0.7), (2, 0.6)]:
        ck.update(epoch, v, {"params": {"w": np.zeros(1)}})
    ck2 = TopKCheckpointer(d, monitor="Dice", mode="max", save_top_k=2)
    assert ck2.restore() == 2
    assert sorted(v for v, _ in ck2.saved) == sorted(
        v for v, _ in ck.saved)
    # and the restored ledger keeps pruning correctly
    ck2.update(3, 0.9, {"params": {"w": np.zeros(1)}})
    assert len(ck2.saved) == 2
    assert max(v for v, _ in ck2.saved) == 0.9


def test_topk_restore_prunes_crash_leftover(tmp_path):
    """A crash between update()'s save and its prune leaves k+1 files;
    restore() must prune back to top-k (keeping the best) instead of
    carrying an oversized ledger forever."""
    from multimodal_fusion_fpn_tpu.train.checkpoints import (
        TopKCheckpointer, save_checkpoint)
    import os
    from os.path import join
    d = str(tmp_path / "ck")
    ck = TopKCheckpointer(d, monitor="Dice", mode="max", save_top_k=2)
    for epoch, v in [(0, 0.5), (1, 0.7)]:
        ck.update(epoch, v, {"params": {"w": np.zeros(1)}})
    # simulate the crash window: a third (better) file exists on disk
    # but the worst was never removed
    save_checkpoint(join(d, "epoch=2-Dice=0.9000.ckpt"),
                    {"params": {"w": np.zeros(1)}})
    ck2 = TopKCheckpointer(d, monitor="Dice", mode="max", save_top_k=2)
    assert ck2.restore() == 2
    assert sorted(v for v, _ in ck2.saved) == [0.7, 0.9]
    files = sorted(os.listdir(d))
    assert len(files) == 2 and "epoch=0-Dice=0.5000.ckpt" not in files
