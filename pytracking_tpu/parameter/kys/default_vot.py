"""KYS VOT parameters (reference pytracking/parameter/kys/default_vot.py)."""

import dataclasses

from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.parameter.kys.default import parameters as _base


def parameters() -> TrackerSpec:
    spec = _base()
    p = dataclasses.replace(
        spec.params,
        image_sample_size=14 * 16, search_area_scale=4.0,
        sample_memory_size=250, learning_rate=0.0075,
        init_samples_minimum_weight=0.0, train_skipping=10,
        net_opt_iter=25, net_opt_update_iter=3, net_opt_hn_iter=3,
        # reference default_vot.py:44: tighter clipped output window than the
        # dataclass default 10.0 (which would be essentially flat at scale 4)
        effective_search_area=4.0,
        # reference default_vot.py:55-57: dimp-score hard-negative mining
        perform_hn_mining_dimp=True, target_neighborhood_scale_safe=2.2,
    )
    return TrackerSpec(params=p, net=spec.net, variables=spec.variables,
                       tracker_kwargs=spec.tracker_kwargs)
