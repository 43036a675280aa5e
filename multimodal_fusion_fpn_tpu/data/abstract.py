"""Abstract dataset.

Behavioral parity with ``/root/reference/common/abstract_dataloader.py``:
patient→visit record expansion from a visits JSON, virtual-epoch length
``multiplier * real_length`` with index modulo, and image reload every
``patches_from_single_image`` patches.  Unlike the reference (a torch
Dataset), randomness for the transform pipeline is derived per
``(seed, epoch, index)`` so results are independent of worker scheduling.
"""

from os.path import join
from typing import Optional, Union

import numpy as np

from multimodal_fusion_fpn_tpu.data.transforms import Compose, deepcopy_record


class AbstractDataset:
    def __init__(self):
        self.visits: dict
        self.path: str
        self.real_length: int
        self.multiplier: int = 1
        self.patches_from_single_image: int = 1
        self.transforms: Optional[Compose] = None
        self.mask_variant: Optional[str] = None
        self.get_spacing: bool = False
        self.patients: Optional[Union[dict, list]] = None
        self.patches_from_current_image: int = 0
        self.record: dict = {}
        self.debug: bool = False

    def _load(self, _index):
        raise NotImplementedError

    def _make_abstract_dataset(self) -> list:
        # Patients given as {'ids': [...]} selects visits by FileSetId;
        # a list selects all visits of the listed patients.
        if isinstance(self.patients, dict):
            self.dataset = self._make_dataset_ids(ids=self.patients["ids"])
        elif isinstance(self.patients, list):
            self.dataset = self._make_dataset(patients=self.patients)
        else:
            raise ValueError("patients must be a dict or a list")
        return self.dataset

    def _record_from_visit(self, patient_id: str, visit: dict) -> dict:
        record = {
            "path": join(self.path, visit["FileSetId"]),
            "FileSetId": visit["FileSetId"],
            "DayInStudy": visit["DayInStudy"],
            "VRCPatId": patient_id,
            "Position": visit["Position"],
            "slo_path": join(self.path,
                             patient_id + "_" + visit["Position"],
                             str(visit["DayInStudy"])),
        }
        return record

    def _make_dataset_ids(self, ids: list) -> list:
        dataset = []
        for k in self.visits:
            for visit in self.visits[k]:
                if visit["FileSetId"] in ids:
                    dataset.append(self._record_from_visit(k, visit))
        return dataset

    def _make_dataset(self, patients) -> list:
        dataset = []
        for k in patients:
            for visit in self.visits[k]:
                dataset.append(self._record_from_visit(k, visit))
        return dataset

    def __getitem__(self, index, rng: Optional[np.random.Generator] = None):
        index = index % self.real_length

        if self.patches_from_current_image >= self.patches_from_single_image:
            self._load(index)
            self.patches_from_current_image = 0
        self.patches_from_current_image += 1

        record = deepcopy_record(self.record)

        if self.transforms is not None:
            record = self.transforms(record, rng)

        if self.debug:
            for k, v in record.items():
                if hasattr(v, "shape"):
                    print("__getitem__", k, v.shape)
        return record

    def get_example(self, index: int,
                    rng: Optional[np.random.Generator] = None) -> dict:
        """Stateless variant of ``__getitem__`` used by the loader: always
        loads the record for ``index`` (no patch-reuse state)."""
        index = index % self.real_length
        self._load(index)
        record = deepcopy_record(self.record)
        if self.transforms is not None:
            record = self.transforms(record, rng)
        return record

    def __len__(self):
        return int(self.multiplier * self.real_length)
