"""Observability artifacts: metric curves and debug image strips.

Parity with the reference's hand-rolled observability
(``/root/reference/common/pl_model_wrapper.py:38-73,169-241,269-297``):
per-epoch ``curves.svg`` + ``curves.json``, and throttled labeled
image-strip PNGs with the mask border overlaid.
"""

import json
import os
import time
from os.path import join
from typing import Dict, List

import numpy as np

from multimodal_fusion_fpn_tpu.ops.resize import resize as host_resize
from multimodal_fusion_fpn_tpu.utils import normalize_data

PYPLOT_COLORS = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
]

IMAGE_KEYS = ["weight", "mask", "prediction", "image", "slo", "faf"]


def _disk(radius: int) -> np.ndarray:
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return (yy ** 2 + xx ** 2) <= radius ** 2


def text_phantom(text: str, size) -> np.ndarray:
    """Render a text label into a [0,1] grayscale array (PIL default
    font; the reference bundles a TTF, which we don't ship)."""
    from PIL import Image, ImageDraw
    w_size, h_size = size
    canvas = Image.new("RGB", size, (255, 255, 255))
    draw = ImageDraw.Draw(canvas)
    bbox = draw.textbbox((0, 0), text)
    tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
    draw.text(((w_size - tw) // 2, (h_size - th) // 2), text,
              fill="#000000")
    arr = (255 - np.asarray(canvas)) / 255.0
    return arr.mean(axis=2)


class CurvePlotter:
    def __init__(self, model_path: str, train_keys: List[str],
                 val_keys: List[str]):
        self.model_path = model_path
        self.curves: Dict[str, list] = {}
        self.metric_colors: Dict[str, str] = {}
        self.metric_figures = []
        colors = list(PYPLOT_COLORS)
        for tm in train_keys:
            if tm not in self.metric_figures:
                self.metric_figures.append(tm)
            self.curves[f"{tm} (train)"] = []
            if tm not in self.metric_colors:
                self.metric_colors[tm] = colors.pop(0)
        for vm in val_keys:
            if vm not in self.metric_figures:
                self.metric_figures.append(vm)
            self.curves[f"{vm} (val)"] = []
            if vm not in self.metric_colors:
                self.metric_colors[vm] = colors.pop(0)

    def append(self, key: str, value: float):
        self.curves.setdefault(key, []).append(float(value))

    def load(self, upto: int = None):
        """Restore history from a previous run's curves.json (exact
        resume); ``upto`` truncates each series to that many epochs."""
        path = join(self.model_path, "curves.json")
        try:
            with open(path) as f:
                saved = json.load(f)
        except (FileNotFoundError, ValueError):
            # Missing or truncated (crash mid-save before the atomic
            # rename existed) history must not abort an exact resume.
            return
        for k, v in saved.items():
            self.curves[k] = list(v)[:upto] if upto is not None else list(v)

    def save(self):
        if not self.metric_figures:
            return
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
        fig, axs = plt.subplots(len(self.metric_figures), 1,
                                figsize=(20, 10 * len(self.metric_figures)),
                                squeeze=False)
        for i, mf in enumerate(self.metric_figures):
            for k in self.curves:
                if mf not in k:
                    continue
                linestyle = "--" if "(val)" in k else "-"
                axs[i, 0].plot(self.curves[k], label=k, linestyle=linestyle,
                               color=self.metric_colors[k.split(" ")[0]])
            axs[i, 0].legend()
            axs[i, 0].set_title(mf)
            axs[i, 0].grid(axis="y")
        fig.savefig(join(self.model_path, "curves.svg"),
                    bbox_inches="tight")
        # Atomic write: a kill during the dump must not leave a
        # truncated curves.json for --resume to choke on.
        path = join(self.model_path, "curves.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.curves, f)
        os.replace(tmp, path)
        plt.close(fig)


def debug_batch(batch: dict, save_dir: str, name_hint=None) -> str:
    """Save a labeled strip PNG: one row per batch element, one column per
    modality (depth-summed, resized to 256x256, normalized, with the mask
    border overlaid on the other panels)."""
    from scipy import ndimage as ndi
    from multimodal_fusion_fpn_tpu.data.imageio_utils import imsave

    images = {}
    labels = None
    batch_size = np.asarray(batch["prediction"]).shape[0]
    borders_key = "weight" if "weight" in batch.keys() else "mask"
    text_labels = {k: text_phantom(k, (256, 32)) for k in IMAGE_KEYS}

    for b_i in range(batch_size):
        bin_mask_borders = None
        for k in IMAGE_KEYS:
            if k not in batch:
                continue
            order = 0 if k == "mask" else 1
            image = np.asarray(batch[k])
            if image.ndim != 5:
                continue
            image = image[b_i, 0].sum(axis=1)
            image = host_resize(image, (256, 256), order=order,
                                anti_aliasing=False)
            image = normalize_data(image)
            if k == borders_key:
                bin_mask = image > 0.5
                bin_mask_borders = (
                    bin_mask.astype(float)
                    - ndi.binary_erosion(bin_mask,
                                         structure=_disk(2)).astype(float))
            elif bin_mask_borders is not None:
                image[bin_mask_borders == 1] = 1
            if b_i in images:
                images[b_i] = np.concatenate([images[b_i], image], axis=1)
            else:
                images[b_i] = image
            if b_i == 0:
                if labels is None:
                    labels = text_labels[k]
                else:
                    labels = np.concatenate([labels, text_labels[k]],
                                            axis=1)

    all_images = np.concatenate([v for _, v in images.items()], axis=0)
    all_images = np.concatenate([labels, all_images], axis=0)

    current_ms = name_hint or str(int(time.time() * 1000))
    if "FileSetId" in batch and isinstance(batch["FileSetId"], list):
        suffix = "_".join(fsid[-6:] for fsid in batch["FileSetId"])
        current_ms = f"{current_ms}.{suffix}"
    out = join(save_dir, f"{current_ms}.png")
    imsave(out, (all_images * 255).astype(np.uint8))
    return out
