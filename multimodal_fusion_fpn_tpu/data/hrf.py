"""HRF GA-segmentation dataset.

Behavioral parity with
``/root/reference/common/dataloader_hrf_spec_aligned_seg.py``: loads
``bscan_flat.<id>.npy`` volumes, ``spacing.<id>.npy``, the FAF- or
OCT-derived mask PNG (÷256 then threshold ≥0.5), and the SLO
(÷256) or FAF (inverted ``1-faf`` then ÷256) complementary modality.
When ``crop == 'oct'`` the pre-resized ``preprocessed_images/bscan_size.``
variants of the 2D images are used.

Array layouts: ``image`` (1, D, H, W); ``mask``/``slo``/``faf``
(1, H, 1, W).
"""

import json
import os
from typing import Optional, Union

import numpy as np

from multimodal_fusion_fpn_tpu.data.abstract import AbstractDataset
from multimodal_fusion_fpn_tpu.data.imageio_utils import imread


class HRF_SPEC_Dataset(AbstractDataset):
    def __init__(self, path, patients: Optional[Union[dict, list]] = None,
                 multiplier=1, patches_from_single_image=1, transforms=None,
                 mask_variant="faf", get_spacing=False,
                 visits_fn: Optional[str] = None,
                 crop: str = "none",
                 fusion_modality: Optional[str] = "slo",
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
        self.crop = crop
        self.fusion_modality = fusion_modality
        self.debug = debug
        assert self.patients is not None
        assert self.visits_fn is not None

        with open(self.visits_fn, "r") as fp:
            self.visits = json.load(fp)

        self.dataset = self._make_abstract_dataset()
        self.real_length = len(self.dataset)
        print("scans:", str(self.real_length))
        self.patches_from_current_image = self.patches_from_single_image

    def _load(self, index):
        self.record = self.dataset[index].copy()
        fsid = self.record["FileSetId"]

        image = np.load(os.path.join(self.record["path"],
                                     "bscan_flat." + fsid + ".npy"))
        # Dimensions: front (B-scans), top (depth), right (width).
        self.record["image"] = image[None]

        if self.get_spacing:
            self.record["spacing"] = np.load(
                os.path.join(self.record["path"],
                             "spacing." + fsid + ".npy"))

        prefix = "preprocessed_images/bscan_size." \
            if self.crop in ["oct"] else ""

        if self.mask_variant == "faf":
            mask = imread(os.path.join(
                self.record["path"],
                "preprocessed_images/bscan_size.mask_faf." + fsid + ".png"))
            mask = mask / 256
        elif self.mask_variant == "oct":
            mask = imread(os.path.join(self.record["path"],
                                       "mask_oct." + fsid + ".png"))
            mask = mask / 256
        else:
            raise ValueError("Unknown mask variant")
        mask = np.where(mask >= 0.5, 1.0, 0.0)
        self.record["mask"] = mask[None, :, None, :]

        if self.fusion_modality == "slo":
            slo = imread(os.path.join(self.record["path"],
                                      prefix + "slo." + fsid + ".png"))
            slo = slo / 256
            self.record["slo"] = slo[None, :, None, :]
        elif self.fusion_modality == "faf":
            faf = imread(os.path.join(self.record["path"],
                                      prefix + "faf." + fsid + ".png"))
            faf = 1 - faf
            faf = faf / 256
            self.record["faf"] = faf[None, :, None, :]
        else:
            raise ValueError("Unknown fusion modality")
