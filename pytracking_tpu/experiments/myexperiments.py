"""Example experiments (reference pytracking/experiments/myexperiments.py)."""

from pytracking_tpu.evaluation.datasets import get_dataset
from pytracking_tpu.evaluation.tracker import Tracker


def dimp_synthetic():
    trackers = [Tracker("dimp", "dimp50")]
    dataset = get_dataset("synthetic")
    return trackers, dataset


def atom_nfs_uav():
    trackers = [Tracker("atom", "default", run_id=i) for i in range(3)]
    dataset = get_dataset("nfs", "uav")
    return trackers, dataset


def uav_test():
    trackers = [Tracker("atom", "default"), Tracker("dimp", "dimp50"),
                Tracker("dimp", "prdimp50")]
    dataset = get_dataset("uav")
    return trackers, dataset
