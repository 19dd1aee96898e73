"""Per-sequence attribute annotations for evaluation datasets.

Re-design of reference `pytracking/evaluation/dataset_attribute_specs/` +
`otbdataset.py:53-76`: a spec is a JSON dict with `att_name_long`, `att_name_short`
and, per sequence name, the list of short attribute tags. The five benchmark
metadata files (OTB/LaSOT/UAV123/AVisT attribute annotations, published with the
respective benchmarks) are BUNDLED in `dataset_attribute_specs/` next to this
module, like the reference; `env_settings().attribute_specs_path` or the dataset
root can override them."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

_SPEC_FILES = {
    "otb": "otb_attributes.json",
    "lasot": "LaSOT_attributes.json",
    "uav": "UAV123_attributes.json",
    "avist": "avist_attributes.json",
    "avist_scenarios": "avist_scenarios.json",
}


_BUNDLED_DIR = os.path.join(os.path.dirname(__file__), "dataset_attribute_specs")


def spec_path(dataset: str) -> Optional[str]:
    from pytracking_tpu.evaluation.environment import env_settings
    env = env_settings()
    fname = _SPEC_FILES.get(dataset, f"{dataset}_attributes.json")
    for root in (getattr(env, "attribute_specs_path", ""),
                 getattr(env, f"{dataset}_path", ""), _BUNDLED_DIR):
        if root:
            p = os.path.join(root, fname)
            if os.path.isfile(p):
                return p
    return None


_cache: Dict[Optional[str], Optional[Dict]] = {}


def load_attribute_spec(dataset: str) -> Optional[Dict]:
    # cache by resolved path, not dataset name: the env override
    # (attribute_specs_path / <dataset>_path) can change between calls
    p = spec_path(dataset)
    if p not in _cache:
        if p is None:
            _cache[p] = None
        else:
            with open(p) as f:
                _cache[p] = json.load(f)
    return _cache[p]


def attribute_names(dataset: str, mode: str = "short") -> List[str]:
    """Short/long attribute names (reference otbdataset.py:53-58)."""
    spec = load_attribute_spec(dataset)
    if spec is None:
        return []
    return spec["att_name_short" if mode == "short" else "att_name_long"]


def sequence_attributes(dataset: str, sequence_name: str) -> List[str]:
    spec = load_attribute_spec(dataset)
    if spec is None:
        return []
    return list(spec.get(sequence_name, []))


def filter_names_by_attribute(dataset: str, names: List[str],
                              attribute: str) -> List[str]:
    """Keep sequences tagged with `attribute` (short or long form)
    (reference otbdataset.py:66-76)."""
    spec = load_attribute_spec(dataset)
    if spec is None:
        raise ValueError(
            f"No attribute spec for '{dataset}' — see "
            "pytracking_tpu/evaluation/attribute_specs.py for where to put it")
    if attribute not in spec["att_name_short"]:
        if attribute in spec["att_name_long"]:
            attribute = spec["att_name_short"][
                spec["att_name_long"].index(attribute)]
        else:
            raise ValueError(f"'{attribute}' attribute invalid.")
    return [n for n in names if attribute in spec.get(n, [])]
