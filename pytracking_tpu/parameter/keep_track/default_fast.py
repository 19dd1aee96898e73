"""KeepTrack-fast parameters (reference
pytracking/parameter/keep_track/default_fast.py): smaller search region and fewer
box refinement iterations for ~2x speed at slightly lower robustness."""

import dataclasses

from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.parameter.keep_track.default import parameters as _base


def parameters() -> TrackerSpec:
    spec = _base()
    p = dataclasses.replace(
        spec.params,
        image_sample_size=22 * 16, search_area_scale=6.0,
        box_refinement_iter=3,
        local_max_candidate_score_th=0.1,
    )
    return TrackerSpec(params=p, net=spec.net, variables=spec.variables,
                       tracker_kwargs=spec.tracker_kwargs)
