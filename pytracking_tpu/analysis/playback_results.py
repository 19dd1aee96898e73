"""Interactive replay of saved tracking results over a sequence.

Re-design of reference `pytracking/analysis/playback_results.py` (Display:19,
playback_results:133): steps through the frames drawing the saved boxes of one or more
trackers; space pauses, arrow keys step, q quits. Headless mode writes a video/PNGs.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

_COLORS = [(0, 255, 0), (255, 0, 0), (0, 0, 255), (255, 255, 0), (255, 0, 255)]


def playback_results(trackers: List, sequence, frame_rate: int = 30,
                     output_path: Optional[str] = None):
    """trackers: evaluation.tracker.Tracker wrappers with saved results for
    `sequence`. If `output_path` is given (or no display is available), frames are
    written to disk instead of shown."""
    import cv2

    from pytracking_tpu.evaluation.running import _read_image

    results = []
    for trk in trackers:
        path = os.path.join(trk.results_dir, f"{sequence.name}.txt")
        results.append(np.loadtxt(path, delimiter="\t"))

    headless = output_path is not None or not os.environ.get("DISPLAY")
    writer = None
    if headless:
        output_path = output_path or f"{sequence.name}_playback.mp4"

    delay = max(int(1000 / frame_rate), 1)
    paused = False
    i = 0
    while i < len(sequence.frames):
        im = _read_image(sequence.frames[i])
        vis = cv2.cvtColor(im, cv2.COLOR_RGB2BGR)
        if sequence.ground_truth_rect is not None and \
                i < len(sequence.ground_truth_rect):
            x, y, w, h = [int(v) for v in sequence.ground_truth_rect[i]]
            cv2.rectangle(vis, (x, y), (x + w, y + h), (255, 255, 255), 1)
        for ti, (trk, res) in enumerate(zip(trackers, results)):
            if i < len(res):
                x, y, w, h = [int(v) for v in res[i]]
                c = _COLORS[ti % len(_COLORS)]
                cv2.rectangle(vis, (x, y), (x + w, y + h), c, 2)
                cv2.putText(vis, f"{trk.name}/{trk.parameter_name}", (x, y - 4),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.4, c, 1)
        cv2.putText(vis, f"{sequence.name} [{i + 1}/{len(sequence.frames)}]",
                    (10, 20), cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 255), 1)

        if headless:
            if writer is None:
                fourcc = cv2.VideoWriter_fourcc(*"mp4v")
                writer = cv2.VideoWriter(output_path, fourcc, frame_rate,
                                         (vis.shape[1], vis.shape[0]))
            writer.write(vis)
            i += 1
            continue

        cv2.imshow("playback", vis)
        key = cv2.waitKey(0 if paused else delay)
        if key == ord("q"):
            break
        if key == ord(" "):
            paused = not paused
        elif key == 83 or key == ord("d"):  # right
            i += 1
        elif key == 81 or key == ord("a"):  # left
            i = max(0, i - 1)
        elif not paused:
            i += 1

    if writer is not None:
        writer.release()
        print(f"Wrote {output_path}")
    else:
        import cv2
        cv2.destroyAllWindows()
