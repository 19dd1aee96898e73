"""CLI: track a target in a video file (reference pytracking/run_video.py).

    python -m pytracking_tpu.run_video dimp dimp50 path/to/video.mp4 \
        --optional_box x y w h
"""

from __future__ import annotations

import argparse


def run_video(tracker_name: str, tracker_param: str, videofile: str,
              optional_box=None, debug: int = 0, save_results: bool = False):
    """Interactive MULTI-object video tracking through run_video_generic
    (reference run_video.py:10-22): draw boxes with the mouse to add targets
    at any frame; 'r' resets, 'q' quits."""
    from pytracking_tpu.evaluation.tracker import Tracker

    tracker = Tracker(tracker_name, tracker_param)
    return tracker.run_video_generic(videofilepath=videofile,
                                     optional_box=optional_box, debug=debug,
                                     save_results=save_results)


def main():
    parser = argparse.ArgumentParser(description="Run the tracker on a video file.")
    parser.add_argument("tracker_name", type=str)
    parser.add_argument("tracker_param", type=str)
    parser.add_argument("videofile", type=str)
    parser.add_argument("--optional_box", type=float, nargs=4, default=None,
                        help="initial box (x y w h); omit to select interactively")
    parser.add_argument("--debug", type=int, default=0)
    parser.add_argument("--save_results", action="store_true")
    args = parser.parse_args()
    run_video(args.tracker_name, args.tracker_param, args.videofile,
              args.optional_box, args.debug, args.save_results)


if __name__ == "__main__":
    main()
