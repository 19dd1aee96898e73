"""CLI: interactive webcam tracking (reference pytracking/run_webcam.py).

    python -m pytracking_tpu.run_webcam dimp dimp50
"""

from __future__ import annotations

import argparse


def run_webcam(tracker_name: str, tracker_param: str, camera_id: int = 0,
               debug: int = 0):
    """Interactive MULTI-object webcam tracking through run_video_generic
    (reference run_webcam.py:10-20): mouse-drawn rectangles add targets at any
    frame; 'r' resets, 'q' quits."""
    from pytracking_tpu.evaluation.tracker import Tracker

    tracker = Tracker(tracker_name, tracker_param)
    return tracker.run_video_generic(videofilepath=None, debug=debug,
                                     camera_id=camera_id)


def main():
    parser = argparse.ArgumentParser(description="Webcam tracking.")
    parser.add_argument("tracker_name", type=str)
    parser.add_argument("tracker_param", type=str)
    parser.add_argument("--camera_id", type=int, default=0)
    parser.add_argument("--debug", type=int, default=0)
    args = parser.parse_args()
    run_webcam(args.tracker_name, args.tracker_param, args.camera_id, args.debug)


if __name__ == "__main__":
    main()
