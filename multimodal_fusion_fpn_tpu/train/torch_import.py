"""PyTorch(-Lightning) checkpoint import.

Maps reference state-dict names onto this framework's parameter tree so
reference-trained weights can be evaluated here (logit-parity
validation).  Name structure in the reference (see
``/root/reference/models/fpn/*.py``):

    model.resensnet.conv1.0.convBlock.2.0.weight     (conv in ConvX)
    model.resensnet.conv1.0.convBlock.2.1.running_var (bn in ConvX)
    model.resensnet.conv1.0.downsample.0.weight      (residual 1x1)
    model.resensnet.zdimRed3.1.convBlock.0.0.weight  (projection 'fully')
    model.resensnet.up_concat4.conv.convBlock.0.0.bias
    model.resensnet.final1.weight

Torch conv kernels are (O, I, k...) — transposed here to channels-last
(k..., I, O).  The eval-side legacy rename (``resensenet`` →
``resensnet``, reference ``validate_ensemble.py:253-256``) is applied by
the caller.
"""

from typing import Dict, Tuple

import numpy as np


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convx_subpath(parts):
    """Map ConvX-internal torch names to flax names.

    parts like ('convBlock', '2', '0', 'weight') or
    ('downsample', '1', 'running_mean').
    Returns (flax_subpath, kind, leaf) where kind is 'conv'|'bn'.
    """
    if parts[0] == "convBlock":
        i = parts[1]
        sub = parts[2]
        leaf = parts[3]
        if sub == "0":
            return (f"conv{i}",), "conv", leaf
        elif sub == "1":
            return (f"bn{i}",), "bn", leaf
        raise KeyError(parts)
    if parts[0] == "downsample":
        sub = parts[1]
        leaf = parts[2]
        if sub == "0":
            return ("ds_conv",), "conv", leaf
        elif sub == "1":
            return ("ds_bn",), "bn", leaf
        raise KeyError(parts)
    raise KeyError(parts)


def _torch_key_to_flax(key: str):
    """Translate one torch state-dict key.

    Returns (collection, path, kind, leaf) where collection is 'params'
    or 'batch_stats', or None for keys to skip.
    """
    parts = key.split(".")
    if parts[0] == "model":
        parts = parts[1:]
    if parts[-1] == "num_batches_tracked":
        return None

    root = parts[0]
    rest = parts[1:]
    prefix: Tuple[str, ...]

    if root in ("one_one", "fusion_module", "final1"):
        # bare convs at the wrapper level
        return ("params", (root,), "conv", parts[-1])

    if root.startswith("resensnet"):
        prefix = (root,)
        mod = rest[0]
        tail = rest[1:]
        if mod == "final1":
            return ("params", prefix + ("final1",), "conv", tail[-1])
        if mod.startswith("conv"):  # encoder stage Sequential(block0, block1)
            block = f"block{tail[0]}"
            sub, kind, leaf = _convx_subpath(tail[1:])
            return (_collection(kind, leaf), prefix + (mod, block) + sub,
                    kind, leaf)
        if mod.startswith("zdimRed"):
            level = int(mod[len("zdimRed"):])
            seq_idx = tail[0]
            # levels 1..4 have (red, fully); level 5 has only (fully)
            if level == 5:
                name = "fully"
            else:
                name = "red" if seq_idx == "0" else "fully"
            sub, kind, leaf = _convx_subpath(tail[1:])
            return (_collection(kind, leaf), prefix + (mod, name) + sub,
                    kind, leaf)
        if mod.startswith("up_concat"):
            assert tail[0] == "conv", key
            sub, kind, leaf = _convx_subpath(tail[1:])
            return (_collection(kind, leaf), prefix + (mod, "conv") + sub,
                    kind, leaf)
    raise KeyError(f"Unmapped torch key: {key}")


def _collection(kind: str, leaf: str) -> str:
    if kind == "bn" and leaf in ("running_mean", "running_var"):
        return "batch_stats"
    return "params"


_BN_LEAF = {"weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var"}


# Reference parameters that exist in checkpoints but are never used by
# the forward pass: FPNLateFusion builds the 3D branch with a final1
# conv and only afterwards sets use_1x1=False (fusion_nets.py:168-171),
# so its checkpoints carry orphan resensnet3d.final1.{weight,bias}.
_KNOWN_UNUSED_PREFIXES = (("resensnet3d", "final1"),)


def _prune_known_unused(tree: Dict, template_paths) -> None:
    """Drop mapped entries under _KNOWN_UNUSED_PREFIXES that the
    template does not declare (in-place)."""
    for prefix in _KNOWN_UNUSED_PREFIXES:
        if any(p[:len(prefix)] == prefix for p in template_paths):
            continue  # the template DOES use it — keep
        node = tree
        for key in prefix[:-1]:
            node = node.get(key, {})
        node.pop(prefix[-1], None)


def map_state_dict(state_dict: Dict[str, "np.ndarray"],
                   params_template, batch_stats_template,
                   strict: bool = True):
    """Convert a torch state dict into (params, batch_stats) trees."""
    import jax

    params: Dict = {}
    batch_stats: Dict = {}
    skipped = []
    for key, tensor in state_dict.items():
        value = np.asarray(tensor.detach().cpu().numpy()
                           if hasattr(tensor, "detach") else tensor)
        translated = _torch_key_to_flax(key)
        if translated is None:
            continue
        collection, path, kind, leaf = translated
        if kind == "conv":
            if leaf == "weight":
                ndim = value.ndim
                # (O, I, k...) -> (k..., I, O)
                perm = tuple(range(2, ndim)) + (1, 0)
                value = value.transpose(perm)
                _set(params, path + ("kernel",), value)
            elif leaf == "bias":
                _set(params, path + ("bias",), value)
            else:
                raise KeyError(key)
        else:  # bn
            flax_leaf = _BN_LEAF[leaf]
            target = params if collection == "params" else batch_stats
            _set(target, path + (flax_leaf,), value)

    # Validate against the templates: same treedef, matching shapes.
    def _check(tree, template, name):
        t_paths = {tuple(str(p.key) for p in kp): leaf.shape
                   for kp, leaf in
                   jax.tree_util.tree_flatten_with_path(template)[0]}
        _prune_known_unused(tree, t_paths)
        g_paths = {tuple(str(p.key) for p in kp): leaf.shape
                   for kp, leaf in
                   jax.tree_util.tree_flatten_with_path(tree)[0]}
        missing = set(t_paths) - set(g_paths)
        extra = set(g_paths) - set(t_paths)
        if strict and (missing or extra):
            raise ValueError(f"{name}: missing={sorted(missing)[:5]} "
                             f"extra={sorted(extra)[:5]}")
        for p in set(t_paths) & set(g_paths):
            if tuple(t_paths[p]) != tuple(g_paths[p]):
                raise ValueError(f"{name}: shape mismatch at {p}: "
                                 f"{t_paths[p]} vs {g_paths[p]}")
        return missing, extra

    _check(params, params_template, "params")
    _check(batch_stats, batch_stats_template, "batch_stats")
    return params, batch_stats
