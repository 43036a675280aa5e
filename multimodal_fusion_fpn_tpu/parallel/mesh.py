"""Device mesh and sharding.

The reference's only parallelism is single-process multi-GPU
DataParallel (``/root/reference/train.py:166``, ``strategy='dp'``).  The
TPU-native equivalent is GSPMD over a ``jax.sharding.Mesh``:

  * ``data`` axis — batch sharding (DP).  Gradients are reduced by XLA
    collectives over ICI automatically; batch-norm statistics become
    *synchronized* across shards (a strict improvement over the
    reference's per-replica BN; the reference semantics can be recovered
    by per-shard ``shard_map``, see ``bn_sync`` flag).
  * ``space`` axis — en-face width sharding (the analogue of sequence /
    context parallelism for this model family: the long axes are spatial).
    XLA inserts halo exchanges for the (3,3,1)-neighborhood convs; the
    depth axis stays local because the projection heads collapse it.

Mesh spec strings: ``"data=4"`` or ``"data=4,space=2"``.
"""

import re
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_spec(spec: Optional[str], n_devices: int) -> Dict[str, int]:
    if not spec:
        return {"data": n_devices}
    axes = {}
    for part in spec.split(","):
        m = re.fullmatch(r"\s*(\w+)\s*=\s*(\d+)\s*", part)
        if not m:
            raise ValueError(f"Bad mesh spec: {spec!r}")
        axes[m.group(1)] = int(m.group(2))
    total = int(np.prod(list(axes.values())))
    if total != n_devices:
        raise ValueError(f"Mesh {axes} needs {total} devices, "
                         f"have {n_devices}")
    return axes


def make_mesh(spec: Optional[str] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    axes = parse_mesh_spec(spec, len(devices))
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, key: str, stacked: bool = False
                   ) -> NamedSharding:
    """Sharding for a batch array in the reference layout.

    Batch dim on 'data'.  When the mesh has a 'space' axis, the en-face
    width axis (last dim of every reference-layout array) is sharded on
    it — 5D activations flow through convs with XLA-managed halos.
    ``stacked``: array carries a leading (accum_steps, ...) micro-batch
    axis (gradient accumulation); that axis stays unsharded.
    """
    spec = [None, None, None, None, None]
    if "data" in mesh.axis_names:
        spec[0] = "data"
    if "space" in mesh.axis_names:
        spec[4] = "space"
    if stacked:
        spec = [None] + spec
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, stacked: bool = False) -> Dict:
    """Place a host batch dict on the mesh (model keys batch-sharded,
    aux arrays replicated).  ``stacked`` marks a leading micro-batch axis
    (arrays are 6D instead of 5D)."""
    model_ndim = 6 if stacked else 5
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim == model_ndim:
            out[k] = jax.device_put(v, batch_sharding(mesh, k, stacked))
        elif hasattr(v, "ndim"):
            out[k] = jax.device_put(v, replicate(mesh))
        else:
            out[k] = v
    return out


def shard_state(state, mesh: Mesh):
    """Replicate parameters / optimizer state across the mesh."""
    rep = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)
