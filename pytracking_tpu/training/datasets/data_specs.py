"""Data-spec split files (reference ltr/data_specs/*.txt): one entry per line,
either integer sequence indices (GOT-10k) or sequence names (LaSOT,
ImagenetVID-MOT). The reference bundles these lists in-repo; here they resolve
from, in order:

  1. $PYTRACKING_TPU_DATA_SPECS_PATH
  2. <package>/training/data_specs/   (drop the reference's files there)
  3. <dataset root>/data_specs/       (keep them next to the data)

so the package stays standalone while remaining file-compatible with the
reference's splits (ltr/dataset/got10k.py:46-60, lasot.py:52-60).
"""

from __future__ import annotations

import os
from typing import List, Optional


def _candidate_dirs(dataset_root: Optional[str]) -> List[str]:
    dirs = []
    env = os.environ.get("PYTRACKING_TPU_DATA_SPECS_PATH")
    if env:
        dirs.append(env)
    dirs.append(os.path.join(os.path.dirname(__file__), "..", "data_specs"))
    if dataset_root:
        dirs.append(os.path.join(dataset_root, "data_specs"))
        dirs.append(os.path.join(dataset_root, "..", "data_specs"))
    return dirs


def find_data_spec(filename: str, dataset_root: Optional[str] = None) -> str:
    for d in _candidate_dirs(dataset_root):
        p = os.path.join(d, filename)
        if os.path.isfile(p):
            return p
    raise FileNotFoundError(
        f"data spec '{filename}' not found. Searched: "
        f"{[os.path.abspath(d) for d in _candidate_dirs(dataset_root)]}. "
        "Set PYTRACKING_TPU_DATA_SPECS_PATH to a directory holding the "
        "reference-format split files (ltr/data_specs/*.txt), or place them "
        "under <dataset root>/data_specs/.")


def load_int_spec(filename: str, dataset_root: Optional[str] = None) -> List[int]:
    with open(find_data_spec(filename, dataset_root)) as f:
        return [int(l.strip()) for l in f if l.strip()]


def load_str_spec(filename: str, dataset_root: Optional[str] = None) -> List[str]:
    with open(find_data_spec(filename, dataset_root)) as f:
        return [l.strip() for l in f if l.strip()]
