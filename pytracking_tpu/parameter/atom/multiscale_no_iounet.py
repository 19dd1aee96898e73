"""ATOM multiscale variant without IoU-Net — the CPU-runnable smoke configuration
(reference pytracking/parameter/atom/multiscale_no_iounet.py; noted CPU-capable at
pytracking/README.md:160-161)."""

from dataclasses import replace

from pytracking_tpu.evaluation.tracker import TrackerSpec
from pytracking_tpu.parameter.atom.default import parameters as default_parameters


def parameters() -> TrackerSpec:
    spec = default_parameters()
    params = replace(spec.params,
                     use_iou_net=False,
                     scale_factors=tuple(float(1.02 ** x) for x in (-2, -1, 0, 1, 2)))
    return TrackerSpec(params=params, net=spec.net, variables=spec.variables)
