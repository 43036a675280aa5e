"""Trainer-loop semantics: grad-accum epoch tail and metametrics.

These stub the compiled steps so the loop logic is tested without
tracing a model (the step math itself is covered by test_train_step.py
and test_dp_bn.py).
"""

import numpy as np

from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.losses import Mix, bce_loss, dice_loss_joint
from multimodal_fusion_fpn_tpu.models.zoo import build_model
from multimodal_fusion_fpn_tpu.train.configs import mmetric
from multimodal_fusion_fpn_tpu.train.optim import sgd
from multimodal_fusion_fpn_tpu.train.trainer import Trainer


class FakeState:
    params = {}
    batch_stats = {}
    # fit() writes resume.ckpt (exact resume, round 4) from these:
    opt_state = ()
    step = 0


class FakeLoader:
    def __init__(self, batches):
        self.batches = batches

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(self.batches)


def _tiny_trainer(tmp_path, tiny_spec, **kw):
    cfg = make_config(model="FPN2D", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=tiny_spec, remat=False)
    criterion = Mix({"d": dice_loss_joint(), "b": bce_loss()})
    return Trainer(model, sgd(0.1), criterion, {}, {}, {},
                   str(tmp_path), epochs=1, save_debug_images=False, **kw)


def _batch(seed, b=2):
    rng = np.random.default_rng(seed)
    return {
        "slo": rng.normal(size=(b, 1, 16, 1, 16)).astype(np.float32),
        "mask": (rng.random((b, 1, 16, 1, 16)) > 0.5).astype(np.float32),
    }


def test_epoch_tail_is_stepped(tmp_path, tiny_spec):
    """3 batches at virtual_batch_size=2 -> one full accumulation step
    (2 micro-batches) plus one tail step (1 micro-batch); the reference's
    Lightning loop also steps on the partial window."""
    tr = _tiny_trainer(tmp_path, tiny_spec, virtual_batch_size=2)

    calls = []

    def fake_step(n):
        def step(state, payload, rng):
            leading = (payload["slo"].shape[0]
                       if n > 1 else None)
            calls.append((n, leading))
            return state, {"loss": 0.0, "parts": {}, "metrics": {}}
        return step

    tr.train_step = fake_step(2)
    tr._tail_steps = {2: tr.train_step}
    tr._make_step = fake_step  # lazily built tail steps

    loader = FakeLoader([_batch(i) for i in range(3)])
    tr._train_epoch(state=object(), loader=loader, epoch=0)

    assert calls == [(2, 2), (1, None)], calls


def test_no_tail_when_divisible(tmp_path, tiny_spec):
    tr = _tiny_trainer(tmp_path, tiny_spec, virtual_batch_size=2)
    calls = []

    def fake_step(n):
        def step(state, payload, rng):
            calls.append(n)
            return state, {"loss": 0.0, "parts": {}, "metrics": {}}
        return step

    tr.train_step = fake_step(2)
    tr._tail_steps = {2: tr.train_step}
    tr._make_step = fake_step

    loader = FakeLoader([_batch(i) for i in range(4)])
    tr._train_epoch(state=object(), loader=loader, epoch=0)
    assert calls == [2, 2], calls


def test_metametric_feeds_monitor(tmp_path, tiny_spec):
    """The checkpoint monitor value comes from the metametric (reference
    ``pl_model_wrapper.py:320-322``: metametrics publish the monitored
    'Dice' from the raw validation results)."""
    tr = _tiny_trainer(tmp_path, tiny_spec)
    tr.metametrics = {"Dice": mmetric(key="RawDice")}
    tr.monitor = "Dice"

    tr._train_epoch = lambda state, loader, epoch: state
    tr._val_epoch = lambda state, loader: {"RawDice": 0.75}

    recorded = []
    tr.checkpointer.update = (
        lambda epoch, value, payload: recorded.append(value))

    tr.fit(state=FakeState(), train_loader=FakeLoader([]),
           val_loader=FakeLoader([]))
    assert recorded == [0.75]


def test_monitor_falls_back_to_val_results(tmp_path, tiny_spec):
    tr = _tiny_trainer(tmp_path, tiny_spec)
    tr.metametrics = {}
    tr.monitor = "Dice"
    tr._train_epoch = lambda state, loader, epoch: state
    tr._val_epoch = lambda state, loader: {"Dice": 0.5}
    recorded = []
    tr.checkpointer.update = (
        lambda epoch, value, payload: recorded.append(value))
    tr.fit(state=FakeState(), train_loader=FakeLoader([]),
           val_loader=FakeLoader([]))
    assert recorded == [0.5]


def test_metrics_drained_once_per_epoch(tmp_path, tiny_spec):
    """Per-step metric arrays are accumulated as device references and
    fetched in ONE extend_values call per metric at epoch end (per-step
    fetches would synchronize the host with every step — ~27 ms tunnel
    latency each on axon)."""
    from multimodal_fusion_fpn_tpu.metrics.streaming import Metrics

    tr = _tiny_trainer(tmp_path, tiny_spec)

    calls = []

    class Recorder(Metrics):
        def extend_values(self, values):
            calls.append(np.atleast_1d(np.asarray(values)))
            super().extend_values(values)

    tr.metrics_train = {"Dice": Recorder()}

    import jax.numpy as jnp
    vals = iter([jnp.asarray([0.1, 0.2]), jnp.asarray([0.3, 0.4]),
                 jnp.asarray([0.5, 0.6])])

    def step(state, payload, rng):
        return state, {"loss": 0.0, "parts": {},
                       "metrics": {"Dice": next(vals)}}

    tr.train_step = step
    tr._tail_steps = {1: step}

    loader = FakeLoader([_batch(i) for i in range(3)])
    tr._train_epoch(state=object(), loader=loader, epoch=0)

    assert len(calls) == 1, f"expected one drain, got {len(calls)}"
    np.testing.assert_allclose(
        calls[0], [0.1, 0.2, 0.3, 0.4, 0.5, 0.6], rtol=1e-6)
    np.testing.assert_allclose(
        tr.metrics_train["Dice"].get(), 0.35, rtol=1e-6)
