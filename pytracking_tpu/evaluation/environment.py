"""Machine-local path configuration.

Re-design of reference `pytracking/evaluation/environment.py` (EnvSettings:6,
env_settings:56): dataset/result paths, auto-generating a `local.py` template on first
use. Additionally honours environment variables (PYTRACKING_TPU_<NAME>) so containers
can configure without writing files.
"""

from __future__ import annotations

import importlib
import os


class EnvSettings:
    def __init__(self):
        root = os.environ.get("PYTRACKING_TPU_ROOT", os.path.expanduser("~/pytracking_tpu_data"))
        self.results_path = os.path.join(root, "tracking_results")
        self.segmentation_path = os.path.join(root, "segmentation_results")
        self.network_path = os.path.join(root, "networks")
        self.result_plot_path = os.path.join(root, "result_plots")
        self.otb_path = ""
        self.nfs_path = ""
        self.uav_path = ""
        self.tpl_path = ""
        self.vot_path = ""
        self.got10k_path = ""
        self.got10k_mask_path = ""
        self.lasot_path = ""
        self.lasot_mask_path = ""
        self.lasot_extension_subset_path = ""
        self.trackingnet_path = ""
        self.trackingnet_mask_path = ""
        self.davis_dir = ""
        self.youtubevos_dir = ""
        self.avist_path = ""
        self.oxuva_path = ""
        self.lagot_path = ""
        self.mobiface_path = ""
        self.attribute_specs_path = ""

        # environment-variable overrides: PYTRACKING_TPU_LASOT_PATH etc.
        for name in list(vars(self)):
            env = os.environ.get("PYTRACKING_TPU_" + name.upper())
            if env:
                setattr(self, name, env)


_env_settings = None


def env_settings() -> EnvSettings:
    global _env_settings
    if _env_settings is None:
        try:
            local = importlib.import_module("pytracking_tpu.evaluation.local")
            _env_settings = local.local_env_settings()
        except ImportError:
            _env_settings = EnvSettings()
    return _env_settings
