"""DiMP-simple tracker (reference pytracking/tracker/dimp_simple/dimp_simple.py):
identical online behavior to DiMP; the network's filter optimizer is the generic
residual-module-driven Gauss-Newton steepest descent
(models/classifier/residual_modules.py). The tracker class is shared."""

from pytracking_tpu.trackers.dimp import DiMPParams, DiMPTracker  # noqa: F401


def get_tracker_class():
    return DiMPTracker
