"""ATOM VOT parameters (reference pytracking/parameter/atom/default_vot.py):
smaller search region + VOT-tuned robustness settings."""

import dataclasses

from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.parameter.atom.default import parameters as _base


def parameters() -> TrackerSpec:
    spec = _base()
    p = dataclasses.replace(
        spec.params,
        max_image_sample_size=(14 * 16) ** 2,
        min_image_sample_size=(14 * 16) ** 2,
        search_area_scale=4.0,
        # reference parameter/atom/default_vot.py:50: window the output scores
        window_output=True,
    )
    return TrackerSpec(params=p, net=spec.net, variables=spec.variables,
                       tracker_kwargs=spec.tracker_kwargs)
