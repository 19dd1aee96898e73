"""CLI: VOT/TraX protocol entry (reference pytracking/run_vot.py).

Invoked by the VOT toolkit:
    python -m pytracking_tpu.run_vot dimp dimp50 [--protocol vot2020]

or, from the toolkit's trackers.ini / tracker_*.m stubs (pytracking_tpu/VOT/),
as `import pytracking_tpu.run_vot as run_vot; run_vot.run_vot2020('dimp',
'dimp50')` — the protocol entries are re-exported here for exactly that.
"""

from __future__ import annotations

import argparse


def run_vot(tracker_name: str, tracker_param: str, run_id=None):
    """Legacy polygon protocol (evaluation/vot.py:144)."""
    from pytracking_tpu.evaluation import vot as vot_adapter
    vot_adapter.run_vot(tracker_name, tracker_param, run_id)


def run_vot2020(tracker_name: str, tracker_param: str, run_id=None):
    """VOT2020 mask protocol (evaluation/vot.py:109)."""
    from pytracking_tpu.evaluation import vot as vot_adapter
    vot_adapter.run_vot2020(tracker_name, tracker_param, run_id)


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
