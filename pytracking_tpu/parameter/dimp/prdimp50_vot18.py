"""PrDiMP-50 VOT2018 parameters (reference
pytracking/parameter/dimp/prdimp50_vot18.py): PrDiMP-50 with VOT-style windowing and
robustness thresholds."""

import dataclasses

from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.parameter.dimp.prdimp50 import parameters as _base


def parameters() -> TrackerSpec:
    spec = _base()
    p = dataclasses.replace(
        spec.params,
        image_sample_size=14 * 16, search_area_scale=4.0,
        sample_memory_size=250, learning_rate=0.0075,
        init_samples_minimum_weight=0.0, train_skipping=10,
        window_output=True, target_not_found_threshold=0.0,
        hard_negative_threshold=0.45, perform_hn_without_windowing=True,
    )
    return TrackerSpec(params=p, net=spec.net, variables=spec.variables,
                       tracker_kwargs=spec.tracker_kwargs)
