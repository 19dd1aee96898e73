"""CLI: VOT/TraX protocol entry (reference pytracking/run_vot.py).

Invoked by the VOT toolkit:
    python -m pytracking_tpu.run_vot dimp dimp50 [--protocol vot2020]
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description="VOT protocol tracker entry.")
    parser.add_argument("tracker_name", type=str)
    parser.add_argument("tracker_param", type=str)
    parser.add_argument("--run_id", type=int, default=None)
    parser.add_argument("--protocol", type=str, default="vot2020",
                        choices=["vot", "vot2020"])
    args = parser.parse_args()

    from pytracking_tpu.evaluation import vot as vot_adapter

    if args.protocol == "vot2020":
        vot_adapter.run_vot2020(args.tracker_name, args.tracker_param, args.run_id)
    else:
        vot_adapter.run_vot(args.tracker_name, args.tracker_param, args.run_id)


if __name__ == "__main__":
    main()
