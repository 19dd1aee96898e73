"""CLI: run a predefined experiment (reference pytracking/run_experiment.py).

An experiment module in `pytracking_tpu/experiments/` exposes a function returning
(trackers, dataset):

    python -m pytracking_tpu.run_experiment myexperiments dimp_test
"""

from __future__ import annotations

import argparse
import importlib


def run_experiment(experiment_module: str, experiment_name: str, debug: int = 0,
                   threads: int = 0):
    from pytracking_tpu.evaluation.running import run_dataset

    module = importlib.import_module(f"pytracking_tpu.experiments.{experiment_module}")
    trackers, dataset = getattr(module, experiment_name)()
    print(f"Running: {experiment_module} {experiment_name}")
    run_dataset(dataset, trackers, debug, threads)


def main():
    parser = argparse.ArgumentParser(description="Run a predefined experiment.")
    parser.add_argument("experiment_module", type=str)
    parser.add_argument("experiment_name", type=str)
    parser.add_argument("--debug", type=int, default=0)
    parser.add_argument("--threads", type=int, default=0)
    args = parser.parse_args()
    run_experiment(args.experiment_module, args.experiment_name, args.debug,
                   args.threads)


if __name__ == "__main__":
    main()
