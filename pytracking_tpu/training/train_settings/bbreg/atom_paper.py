"""ATOM paper-settings recipe (reference ltr/train_settings/bbreg/atom_paper.py): the
default ATOM recipe at the original paper's operating point (search_area_factor 5,
jitter as published)."""

from pytracking_tpu.training.settings import Settings
from pytracking_tpu.training.train_settings.bbreg.atom import run as _run_atom


def run(settings: Settings, **kwargs):
    settings.description = "ATOM paper settings"
    settings.search_area_factor = 5.0
    settings.center_jitter_factor = {"train": 0, "test": 4.5}
    settings.scale_jitter_factor = {"train": 0, "test": 0.5}
    return _run_atom(settings, **kwargs)
