"""DiMP-50 VOT2018 parameters (reference pytracking/parameter/dimp/dimp50_vot18.py):
smaller search region, large memory, aggressive augmentation, windowed output and
VOT-style robustness thresholds."""

import dataclasses

from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.parameter.dimp.dimp50 import parameters as _base


def parameters() -> TrackerSpec:
    spec = _base()
    p = dataclasses.replace(
        spec.params,
        image_sample_size=14 * 16, search_area_scale=4.0,
        sample_memory_size=250, learning_rate=0.0075,
        init_samples_minimum_weight=0.0, train_skipping=10,
        net_opt_iter=25, net_opt_update_iter=3, net_opt_hn_iter=3,
        window_output=True,
        augmentation=(("fliplr", True),
                      ("rotate", (5, -5, 10, -10, 20, -20, 30, -30, 45, -45,
                                  -60, 60)),
                      ("blur", ((2, 0.2), (0.2, 2), (3, 1), (1, 3), (2, 2))),
                      ("relativeshift", ((0.6, 0.6), (-0.6, 0.6), (0.6, -0.6),
                                         (-0.6, -0.6))),
                      ("dropout", (7, 0.2))),
        target_not_found_threshold=0.0, distractor_threshold=100.0,
        hard_negative_threshold=0.45, displacement_scale=0.7,
        perform_hn_without_windowing=True,
    )
    return TrackerSpec(params=p, net=spec.net, variables=spec.variables,
                       tracker_kwargs=spec.tracker_kwargs)
