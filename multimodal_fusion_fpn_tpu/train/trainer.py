"""Training runtime: epoch loop, validation, checkpoints, observability.

Replaces the reference's PyTorch-Lightning runtime (``train.py:155-181``,
``pl_model_wrapper.py``) with a functional JAX loop:

  * jitted train step (forward+backward+update+metrics on device);
  * async dispatch gives compute/host-pipeline overlap for free — the
    threaded loader prepares batch N+1 while the device runs step N;
  * validation every epoch with the host-side streaming metrics
    (Dice/BCE/Hausdorff/HD95 — Hausdorff needs host scipy anyway);
  * top-5-by-Dice checkpoints + early stopping + curves.svg/json +
    throttled debug-image strips, matching the reference's artifacts.
"""

import os
from os.path import join
from typing import Dict, Optional

import jax
import numpy as np

from multimodal_fusion_fpn_tpu.train.checkpoints import TopKCheckpointer
from multimodal_fusion_fpn_tpu.train.state import TrainState
from multimodal_fusion_fpn_tpu.train.step import (make_eval_step,
                                                  make_train_step,
                                                  model_batch)
from multimodal_fusion_fpn_tpu.utils import MonitorLearning
from multimodal_fusion_fpn_tpu.viz import CurvePlotter, debug_batch


class Trainer:
    def __init__(self, model, tx, criterion,
                 metrics_train: Dict, metrics_val: Dict, metametrics: Dict,
                 model_path: str,
                 epochs: int = 40,
                 virtual_batch_size: int = 1,
                 monitor: str = "Dice", monitor_mode: str = "max",
                 save_top_k: int = 5,
                 early_stopping: Optional[int] = None,
                 seed: int = 1234,
                 save_debug_images: bool = True,
                 mesh=None, bn_sync: bool = True):
        self.model = model
        self.tx = tx
        self.criterion = criterion
        self.metrics_train = metrics_train or {}
        self.metrics_val = metrics_val or {}
        self.metametrics = metametrics or {}
        self.model_path = model_path
        self.epochs = epochs
        self.vbs = max(1, virtual_batch_size)
        self.monitor = monitor
        self.monitor_mode = monitor_mode
        self.early_stopping = early_stopping
        self.seed = seed
        self.save_debug_images = save_debug_images

        self.mesh = mesh
        self.bn_sync = bn_sync
        if mesh is not None:
            # lets the fused Pallas lowering run UNDER the mesh
            # (shard_map + halo exchange) instead of falling back to
            # the per-op path — see fused_conv.set_space_sharding.
            from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import \
                set_space_sharding
            set_space_sharding(mesh)
        self.train_step = self._make_step(self.vbs)
        # Epoch-tail steps (accum_steps < vbs) compiled lazily, cached by
        # tail length — the reference's Lightning loop still steps on a
        # partial accumulation window at epoch end.
        self._tail_steps = {self.vbs: self.train_step}
        self.eval_step = make_eval_step(model)
        self.checkpointer = TopKCheckpointer(
            model_path, monitor=monitor, mode=monitor_mode,
            save_top_k=save_top_k)
        self.curves = CurvePlotter(model_path,
                                   list(self.metrics_train.keys()),
                                   list(self.metrics_val.keys()))
        self.monitor_learning = MonitorLearning()
        self.interrupted = False
        if save_debug_images:
            os.makedirs(join(model_path, "images"), exist_ok=True)

    # ------------------------------------------------------------------
    def _make_step(self, accum_steps: int):
        if self.mesh is not None:
            from multimodal_fusion_fpn_tpu.parallel.step import \
                make_dp_train_step
            return make_dp_train_step(self.model, self.tx, self.criterion,
                                      self.mesh, bn_sync=self.bn_sync,
                                      accum_steps=accum_steps)
        return make_train_step(self.model, self.tx, self.criterion,
                               accum_steps=accum_steps)

    def _tail_step(self, n: int):
        if n not in self._tail_steps:
            self._tail_steps[n] = self._make_step(n)
        return self._tail_steps[n]

    def _stack_micro_batches(self, batches):
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
        if self.mesh is not None:
            from multimodal_fusion_fpn_tpu.parallel.mesh import shard_batch
            stacked = shard_batch(stacked, self.mesh, stacked=True)
        return stacked

    def _run_step(self, state, stacked_or_batch, epoch, step_in_epoch,
                  rng, accum_len):
        step_rng = jax.random.fold_in(
            jax.random.fold_in(rng, epoch), step_in_epoch)
        step = (self.train_step if accum_len == self.vbs
                else self._tail_step(accum_len))
        return step(state, stacked_or_batch, step_rng)

    def _drain_metrics(self, pending: Dict) -> None:
        """Fetch the epoch's accumulated per-step metric arrays in ONE
        device round trip per metric.  Fetching inside the step loop
        would synchronize the host with every step — on the axon tunnel
        each fetched call pays ~27 ms, which serializes dispatch and
        costs more than 10% of a flagship step per metric."""
        import jax.numpy as jnp
        for k, chunks in pending.items():
            if not chunks:
                continue
            if len(chunks) == 1:
                vals = np.atleast_1d(np.asarray(chunks[0]))
            else:
                vals = np.asarray(jnp.concatenate(
                    [jnp.atleast_1d(jnp.asarray(c)) for c in chunks]))
            self.metrics_train[k].extend_values(vals)

    def _train_epoch(self, state: TrainState, loader, epoch: int):
        loader.set_epoch(epoch)
        rng = jax.random.PRNGKey(self.seed)
        pending = []
        pending_metrics = {k: [] for k in self.metrics_train}
        step_in_epoch = 0

        def flush(state, micro_batches):
            n = len(micro_batches)
            if n == 1:
                payload = micro_batches[0]
                if self.mesh is not None:
                    from multimodal_fusion_fpn_tpu.parallel.mesh import \
                        shard_batch
                    payload = shard_batch(payload, self.mesh)
            else:
                payload = self._stack_micro_batches(micro_batches)
            return self._run_step(state, payload, epoch, step_in_epoch,
                                  rng, n)

        from multimodal_fusion_fpn_tpu.utils import device_prefetch
        for batch in device_prefetch(iter(loader)):
            mb = model_batch(batch)
            if self.mesh is not None and self.vbs == 1:
                from multimodal_fusion_fpn_tpu.parallel.mesh import \
                    shard_batch
                mb = shard_batch(mb, self.mesh)
            if self.vbs > 1:
                pending.append((mb, batch))
                if len(pending) < self.vbs:
                    continue
                display_batch = pending[-1][1]
                state, aux = flush(state, [p[0] for p in pending])
                pending = []
            else:
                display_batch = batch
                state, aux = self._run_step(state, mb, epoch,
                                            step_in_epoch, rng, 1)
            step_in_epoch += 1

            for k in self.metrics_train:
                if k in aux["metrics"]:
                    pending_metrics[k].append(aux["metrics"][k])

            if (self.save_debug_images
                    and self.monitor_learning.is_save_time()):
                try:
                    out = self.eval_step(state.params, state.batch_stats,
                                         model_batch(display_batch))
                    dbg = dict(display_batch)
                    dbg["prediction"] = np.asarray(out["prediction"])
                    debug_batch(dbg, join(self.model_path, "images"))
                except Exception as exc:  # observability must not kill runs
                    print("debug_batch failed:", exc)

        if pending:
            # Partial accumulation window at epoch end: still step, like
            # the reference's Lightning accumulate_grad_batches.
            state, aux = flush(state, [p[0] for p in pending])
            pending = []
            for k in self.metrics_train:
                if k in aux["metrics"]:
                    pending_metrics[k].append(aux["metrics"][k])
        self._drain_metrics(pending_metrics)
        return state

    def _val_epoch(self, state: TrainState, loader) -> Dict[str, float]:
        from multimodal_fusion_fpn_tpu.utils import device_prefetch
        for metric in self.metrics_val.values():
            metric.reset()
        for batch in device_prefetch(iter(loader)):
            out = self.eval_step(state.params, state.batch_stats,
                                 model_batch(batch))
            host_out = {"prediction": np.asarray(out["prediction"])}
            for metric in self.metrics_val.values():
                metric.update(batch, host_out)
        results = {k: float(m.get()) for k, m in self.metrics_val.items()}
        for metric in self.metrics_val.values():
            metric.reset()
        return results

    # ------------------------------------------------------------------
    def fit(self, state: TrainState, train_loader, val_loader,
            start_epoch: int = 0, early_state=None):
        """Run the epoch loop.  ``start_epoch``/``early_state`` support
        exact epoch-boundary resume (train.py --resume): the step RNG is
        stateless (PRNGKey(seed) folded with epoch/step) and the loader
        reshuffles deterministically per epoch, so a restored state
        reproduces the uninterrupted trajectory bit-for-bit."""
        best = None
        patience_left = self.early_stopping
        if early_state is not None:
            best = early_state.get("best")
            patience_left = early_state.get("patience_left",
                                            patience_left)
        if start_epoch > 0:
            self.checkpointer.restore()
            self.curves.load(upto=start_epoch)
        try:
            for epoch in range(start_epoch, self.epochs):
                state = self._train_epoch(state, train_loader, epoch)

                train_results = {k: float(m.get())
                                 for k, m in self.metrics_train.items()}
                for k, m in self.metrics_train.items():
                    m.reset()
                    self.curves.append(f"{k} (train)", train_results[k])

                val_results = self._val_epoch(state, val_loader)
                for k, v in val_results.items():
                    self.curves.append(f"{k} (val)", v)
                self.curves.save()

                # Metametrics re-expose derived values under their own
                # names — in the reference this is the only path that
                # publishes the checkpoint monitor ('Dice') at all
                # (``pl_model_wrapper.py:320-322``).  Fall back to the raw
                # val results when no metametric provides the monitor.
                meta_results = {str(k): mm.get(val_results)
                                for k, mm in self.metametrics.items()}
                monitor_value = meta_results.get(
                    self.monitor, val_results.get(self.monitor, np.nan))
                print(f"[epoch {epoch}] train={train_results} "
                      f"val={val_results}")

                self.checkpointer.update(
                    epoch, monitor_value,
                    {"params": state.params,
                     "batch_stats": state.batch_stats})

                if self.early_stopping is not None:
                    improved = (best is None
                                or (monitor_value > best
                                    if self.monitor_mode == "max"
                                    else monitor_value < best))
                    if improved:
                        best = monitor_value
                        patience_left = self.early_stopping
                    else:
                        patience_left -= 1
                        if patience_left <= 0:
                            print(f"Early stopping at epoch {epoch}")
                            break
                self._save_resume(state, epoch, best, patience_left)
        except KeyboardInterrupt:
            self.interrupted = True
            print("Training interrupted")
        return state

    def _save_resume(self, state: TrainState, epoch: int, best,
                     patience_left) -> None:
        """Epoch-boundary resume checkpoint (exact resume; consumed by
        train.py --resume, deleted on successful completion)."""
        from multimodal_fusion_fpn_tpu.train.checkpoints import \
            save_checkpoint
        save_checkpoint(join(self.model_path, "resume.ckpt"), {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "next_epoch": np.asarray(epoch + 1),
            "best": np.asarray(np.nan if best is None else best),
            "patience_left": np.asarray(
                -1 if patience_left is None else patience_left),
        })
