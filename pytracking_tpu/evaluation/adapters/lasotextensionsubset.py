"""LaSOT extension subset adapter (reference
pytracking/evaluation/lasotextensionsubsetdataset.py). Same layout as LaSOT under
`lasot_extension_subset_path`."""

from __future__ import annotations

import os

from pytracking_tpu.evaluation.adapters.lasot import LaSOTDataset
from pytracking_tpu.evaluation.data import SequenceList


class LaSOTExtensionSubsetDataset(LaSOTDataset):
    def __init__(self):
        super().__init__()
        self.base_path = self.env_settings.lasot_extension_subset_path

    def get_sequence_list(self) -> SequenceList:
        seqs = super().get_sequence_list()
        for s in seqs:
            s.dataset = "lasot_extension_subset"
        return seqs
