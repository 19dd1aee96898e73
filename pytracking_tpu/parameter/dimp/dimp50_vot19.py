"""DiMP-50 VOT2019 parameters (reference pytracking/parameter/dimp/dimp50_vot19.py)."""

import dataclasses

from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.parameter.dimp.dimp50_vot18 import parameters as _vot18


def parameters() -> TrackerSpec:
    spec = _vot18()
    p = dataclasses.replace(
        spec.params,
        image_sample_size=16 * 16, search_area_scale=4.5,
        sample_memory_size=100,
        net_opt_iter=15, net_opt_update_iter=2, net_opt_hn_iter=2,
        augmentation=(("fliplr", True),
                      ("rotate", (-5, 10, -30, 60)),
                      ("blur", ((2, 0.2), (1, 3))),
                      ("relativeshift", ((0.6, 0.6), (-0.6, -0.6))),
                      ("dropout", (3, 0.2))),
        augmentation_expansion_factor=1.4,
        box_refinement_iter=3,
    )
    return TrackerSpec(params=p, net=spec.net, variables=spec.variables,
                       tracker_kwargs=spec.tracker_kwargs)
