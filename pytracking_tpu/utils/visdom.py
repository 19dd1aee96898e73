"""Live-debug visualization registry.

Re-design of reference `pytracking/utils/visdom.py` (Visdom:376, typed panes :12-374):
the same `register(data, mode, debug_level, title)` API, backed by the `visdom` server
when available and by matplotlib PNG dumps otherwise (headless TPU VMs). Supported
modes: 'image', 'heatmap', 'lineplot', 'info_dict', 'Tracking'.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class Visdom:
    def __init__(self, debug: int = 0, ui_info=None, visdom_info: Optional[dict] = None,
                 dump_dir: Optional[str] = None):
        self.debug = debug
        self.dump_dir = dump_dir or os.environ.get("PYTRACKING_TPU_DEBUG_DIR",
                                                   "/tmp/pytracking_tpu_debug")
        self._step = 0
        visdom_info = visdom_info or {}
        self._vis = None
        try:
            import visdom as _visdom
            self._vis = _visdom.Visdom(server=visdom_info.get("server", "127.0.0.1"),
                                       port=visdom_info.get("port", 8097))
        except Exception:
            os.makedirs(self.dump_dir, exist_ok=True)

    def register(self, data, mode: str, debug_level: int = 0, title: str = "Data"):
        if debug_level > self.debug:
            return
        self._step += 1
        if self._vis is not None:
            self._register_visdom(data, mode, title)
        else:
            self._register_dump(data, mode, title)

    # ------------------------------------------------------------------ backends

    def _register_visdom(self, data, mode, title):
        v = self._vis
        if mode == "image":
            v.image(np.asarray(data).transpose(2, 0, 1), win=title,
                    opts={"title": title})
        elif mode == "heatmap":
            v.heatmap(np.flipud(np.asarray(data).squeeze()), win=title,
                      opts={"title": title})
        elif mode == "lineplot":
            y = np.asarray(data[0] if isinstance(data, (tuple, list)) else data)
            v.line(y, win=title, opts={"title": title})
        elif mode == "info_dict":
            text = "<br>".join(f"{k}: {v_}" for k, v_ in dict(data).items())
            v.text(text, win=title, opts={"title": title})
        elif mode == "Tracking":
            im = np.asarray(data[0])
            v.image(im.transpose(2, 0, 1), win=title, opts={"title": title})

    def _register_dump(self, data, mode, title):
        """Headless fallback: periodic PNG/text dumps."""
        if self._step % 20 != 0:
            return
        safe = title.replace(" ", "_").replace("/", "_")
        path = os.path.join(self.dump_dir, f"{safe}_{self._step:06d}")
        try:
            if mode in ("image", "heatmap", "Tracking"):
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
                arr = np.asarray(data[0] if mode == "Tracking" else data).squeeze()
                plt.figure()
                plt.imshow(arr)
                plt.title(title)
                plt.savefig(path + ".png")
                plt.close()
            elif mode == "info_dict":
                with open(path + ".txt", "w") as f:
                    for k, v in dict(data).items():
                        f.write(f"{k}: {v}\n")
        except Exception:
            pass
