"""CLI: evaluate a tracker on a dataset.

Re-design of reference `pytracking/run_tracker.py` (run_tracker:15-37).

    python -m pytracking_tpu.run_tracker dimp dimp50 --dataset_name synthetic
"""

from __future__ import annotations

import argparse

from pytracking_tpu.evaluation.datasets import get_dataset
from pytracking_tpu.evaluation.running import run_dataset
from pytracking_tpu.evaluation.tracker import Tracker


def run_tracker(tracker_name: str, tracker_param: str, run_id=None,
                dataset_name: str = "synthetic", sequence=None, debug: int = 0,
                threads: int = 0, shard: int = 0, num_shards: int = 1,
                profile_dir=None):
    dataset = get_dataset(dataset_name)
    if sequence is not None:
        dataset = [dataset[sequence]]
    trackers = [Tracker(tracker_name, tracker_param, run_id)]
    run_dataset(dataset, trackers, debug, threads, shard=shard,
                num_shards=num_shards, profile_dir=profile_dir)


def main():
    import os
    plat = os.environ.get("PYTRACKING_TPU_PLATFORM")
    if plat:
        # the axon plugin overrides the JAX_PLATFORMS env var in some images; the
        # jax.config route always wins
        import jax
        jax.config.update("jax_platforms", plat)

    parser = argparse.ArgumentParser(description="Run tracker on a dataset.")
    parser.add_argument("tracker_name", type=str)
    parser.add_argument("tracker_param", type=str)
    parser.add_argument("--runid", type=int, default=None)
    parser.add_argument("--dataset_name", type=str, default="synthetic")
    parser.add_argument("--sequence", type=str, default=None)
    parser.add_argument("--debug", type=int, default=0)
    parser.add_argument("--threads", type=int, default=0)
    parser.add_argument("--shard", type=int, default=0,
                        help="this process's shard of the sequence list")
    parser.add_argument("--num_shards", type=int, default=1,
                        help="total eval processes/hosts")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler XProf trace of the first "
                             "sequence here")
    args = parser.parse_args()
    run_tracker(args.tracker_name, args.tracker_param, args.runid, args.dataset_name,
                args.sequence, args.debug, args.threads, args.shard,
                args.num_shards, args.profile_dir)


if __name__ == "__main__":
    main()
