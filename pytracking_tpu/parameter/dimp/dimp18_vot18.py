"""DiMP-18 VOT2018 parameters (reference pytracking/parameter/dimp/dimp18_vot18.py):
the VOT18 settings with the ResNet-18 network."""

from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.parameter.dimp.dimp18 import parameters as _dimp18
from pytracking_tpu.parameter.dimp.dimp50_vot18 import parameters as _vot18


def parameters() -> TrackerSpec:
    net_spec = _dimp18()
    vot_spec = _vot18()
    return TrackerSpec(params=vot_spec.params, net=net_spec.net,
                       variables=net_spec.variables)
