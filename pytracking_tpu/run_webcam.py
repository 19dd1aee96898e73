"""CLI: interactive webcam tracking (reference pytracking/run_webcam.py).

    python -m pytracking_tpu.run_webcam dimp dimp50
"""

from __future__ import annotations

import argparse


def run_webcam(tracker_name: str, tracker_param: str, camera_id: int = 0,
               debug: int = 0):
    import cv2
    import numpy as np

    from pytracking_tpu.evaluation.multi_object_wrapper import MultiObjectWrapper
    from pytracking_tpu.evaluation.tracker import Tracker

    wrapper = Tracker(tracker_name, tracker_param)
    spec = wrapper.get_parameters()
    multi = MultiObjectWrapper(wrapper.tracker_class, spec.params, spec.net,
                               spec.variables)

    cap = cv2.VideoCapture(camera_id)
    next_id = 1
    initialized = False
    display_name = "pytracking_tpu webcam"
    cv2.namedWindow(display_name, cv2.WINDOW_NORMAL)

    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frame_rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        vis = frame.copy()

        key = cv2.waitKey(1)
        if key == ord("q"):
            break
        if key == ord("r"):
            initialized = False
        if key == ord(" "):  # draw a new target box
            box = cv2.selectROI(display_name, frame, False)
            oid = str(next_id)
            next_id += 1
            info = {"object_ids": [oid], "init_bbox": {oid: list(box)}}
            if not initialized:
                multi.initialize(frame_rgb, info)
                initialized = True
            else:
                multi.track(frame_rgb, info)
            continue

        if initialized:
            out = multi.track(frame_rgb)
            for oid, bb in out["target_bbox"].items():
                x, y, w, h = [int(v) for v in bb]
                cv2.rectangle(vis, (x, y), (x + w, y + h), (0, 255, 0), 2)
                cv2.putText(vis, str(oid), (x, y - 5), cv2.FONT_HERSHEY_SIMPLEX,
                            0.6, (0, 255, 0), 2)
        cv2.putText(vis, "space: add target, r: reset, q: quit", (10, 20),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
        cv2.imshow(display_name, vis)
    cap.release()
    cv2.destroyAllWindows()


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
