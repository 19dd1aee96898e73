"""Result-analysis walkthrough (script form of the reference's
pytracking/notebooks/analyze_results.ipynb).

Run after evaluating trackers (run_tracker); produces the score table, success /
precision plots, per-sequence table and (when the dataset has attribute annotations)
the per-attribute radar plot.

    PYTRACKING_TPU_PLATFORM=cpu python -m pytracking_tpu.notebooks.analyze_results \
        --dataset synthetic --trackers dimp/dimp50 atom/default
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", type=str, default="synthetic")
    parser.add_argument("--trackers", nargs="+", default=["dimp/dimp50"],
                        help="name/param[/runid] entries")
    parser.add_argument("--report_name", type=str, default="report")
    parser.add_argument("--per_sequence", action="store_true")
    parser.add_argument("--radar", action="store_true")
    parser.add_argument("--attributes", action="store_true",
                        help="attribute/scenario-wise AUC table (e.g. the AVisT "
                             "scenario breakdown of analyze_avist_results.ipynb)")
    args = parser.parse_args()

    from pytracking_tpu.analysis.plot_results import (
        plot_attributes_radar, plot_results, print_per_attribute_results,
        print_per_sequence_results, print_results)
    from pytracking_tpu.evaluation.datasets import get_dataset
    from pytracking_tpu.evaluation.tracker import Tracker

    trackers = []
    for t in args.trackers:
        parts = t.split("/")
        run_id = int(parts[2]) if len(parts) > 2 else None
        trackers.append(Tracker(parts[0], parts[1], run_id))

    dataset = get_dataset(args.dataset)
    print_results(trackers, dataset, args.report_name)
    plot_results(trackers, dataset, args.report_name)
    if args.per_sequence:
        print_per_sequence_results(trackers, dataset, args.report_name)

    specs = None
    if args.dataset.startswith("avist"):
        from pytracking_tpu.evaluation.adapters.avist import load_scenarios
        sc = load_scenarios()
        specs = dict(zip(sc.get("att_name_short", []),
                         sc.get("att_name_long", [])))
    if args.attributes:
        print_per_attribute_results(trackers, dataset, args.report_name,
                                    attribute_specs=specs)
    if args.radar:
        plot_attributes_radar(trackers, dataset, args.report_name,
                              attribute_specs=specs)


if __name__ == "__main__":
    main()
