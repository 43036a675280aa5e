"""VRC vessel-segmentation dataset.

Behavioral parity with ``/root/reference/common/dataloader_vrc_vessel.py``:
``oct_variant`` 'flat' (optionally the low-res ``preprocessed_bscan='lr2'``
files) or 'crop' file layouts; mask variants ``sq_proj_dil`` →
``bscan_size.vs_proj.dil.*.png`` else ``vs.vmirror.*.png``; SLO with the
``bscan_size.`` prefix when ``crop == 'oct'``.
"""

import json
import os
from os.path import join
from pathlib import Path
from typing import Optional

import numpy as np

from multimodal_fusion_fpn_tpu.data.abstract import AbstractDataset
from multimodal_fusion_fpn_tpu.data.imageio_utils import imread


class VRC_Dataset(AbstractDataset):
    def __init__(self, path, patients=None, multiplier=1,
                 patches_from_single_image=1, transforms=None,
                 mask_variant=None, get_spacing=False,
                 visits_fn: Optional[str] = None,
                 preprocessed_bscan: Optional[str] = None,
                 oct_variant: str = "flat",
                 crop: str = "none",
                 debug: bool = False):
        super().__init__()
        self.path = path
        self.multiplier = multiplier
        self.patches_from_single_image = patches_from_single_image
        self.transforms = transforms
        self.mask_variant = mask_variant
        self.get_spacing = get_spacing
        self.patients = patients
        self.visits_fn = visits_fn
        self.preprocessed_bscan = preprocessed_bscan
        self.oct_variant = oct_variant
        self.crop = crop
        self.debug = debug

        assert self.patients is not None
        assert self.visits_fn is not None

        with open(self.visits_fn, "r") as fp:
            self.visits = json.load(fp)

        self.dataset = self._make_abstract_dataset()
        self.real_length = len(self.dataset)
        print("scans:", str(self.real_length))
        self.patches_from_current_image = self.patches_from_single_image

    def _make_dataset_ids(self, ids: list) -> list:
        raise NotImplementedError

    def _make_dataset(self, patients) -> list:
        dataset = []
        for k in patients:
            for visit in self.visits[k]:
                dataset.append({
                    "path": join(self.path, k),
                    "FileSetId": visit["FileSetId"],
                    "VRCPatId": k,
                })
        return dataset

    def _load(self, index):
        self.record = self.dataset[index].copy()
        fsid = self.record["FileSetId"]

        if self.oct_variant == "flat":
            bscan_fn = "bscan_flat." + fsid + ".npy"
            if self.preprocessed_bscan is not None:
                bscan_fn = ("preprocessed_images/bscan_flat."
                            + self.preprocessed_bscan + "." + fsid + ".npy")
            image = np.load(os.path.join(self.record["path"], bscan_fn))
            if self.get_spacing:
                self.record["spacing"] = np.load(
                    os.path.join(self.record["path"],
                                 "spacing." + fsid + ".npy"))

            if self.mask_variant == "sq_proj_dil":
                mask_fn = "bscan_size.vs_proj.dil." + fsid + ".png"
            else:
                mask_fn = "vs.vmirror." + fsid + ".png"
            mask = imread(os.path.join(self.record["path"],
                                       "preprocessed_images", mask_fn))
            mask = mask / 256
            mask = mask > 0.5  # note: boolean mask (flat variant)

            prefix = "preprocessed_images/bscan_size." \
                if self.crop in ["oct"] else ""
            slo = imread(os.path.join(self.record["path"],
                                      prefix + "slo." + fsid + ".png"))
            slo = slo / 256

            self.record["image"] = image[None]
            self.record["mask"] = mask[None, :, None, :]
            self.record["slo"] = slo[None, :, None, :]
        elif self.oct_variant == "crop":
            path = Path(self.record["path"], "cropped")
            image = np.load(join(path, f"bscan_crop.{fsid}.npy"))
            if self.get_spacing:
                self.record["spacing"] = np.load(
                    join(path.parent, f"spacing.{fsid}.npy"))
            self.record["image"] = image[None]

            mask = imread(join(path, f"vs_crop.{fsid}.png"))
            mask = mask / 256
            mask = np.where(mask >= 0.5, 1.0, 0.0)
            self.record["mask"] = mask[None, :, None, :]

            slo = imread(join(path, f"slo_crop.{fsid}.png"))
            slo = slo / 256
            self.record["slo"] = slo[None, :, None, :]
        else:
            raise ValueError("Unknown OCT variant: " + self.oct_variant)
