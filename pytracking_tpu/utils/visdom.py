"""Live-debug visualization registry.

Re-design of reference `pytracking/utils/visdom.py` (typed panes VisBase..:12-374,
Visdom:376-434): the same `register(data, mode, debug_level, title)` API with a
block-list of checkbox-toggleable panes, per-channel feature-map panes, interactive
cost-volume slicing (arrow keys + Enter in the 'cost_volume_ui' window), and the
pause/step tracking UI. Backed by the `visdom` server when available and by
matplotlib PNG dumps otherwise (headless TPU VMs).

Data is numpy/JAX NHWC throughout (images (H, W, 3) RGB; feature maps (C, H, W);
cost volumes (H*W, H, W) in the KYS absolute layout).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _np(x):
    return np.asarray(x)


class VisBase:
    """(reference visdom.py:12-40)"""

    def __init__(self, visdom, show_data: bool, title: str):
        self.visdom = visdom
        self.show_data = show_data
        self.title = title
        self.raw_data = None

    def update(self, data, **kwargs):
        self.save_data(data, **kwargs)
        if self.show_data:
            self.draw_data()

    def save_data(self, data, **kwargs):
        self.raw_data = data

    def draw_data(self):
        raise NotImplementedError

    def toggle_display(self, new_mode=None):
        self.show_data = (not self.show_data) if new_mode is None else new_mode
        if self.show_data:
            self.draw_data()


class VisImage(VisBase):
    def draw_data(self):
        im = _np(self.raw_data)
        if im.ndim == 3 and im.shape[-1] in (1, 3):
            im = im.transpose(2, 0, 1)
        self.visdom.image(im, win=self.title, opts={"title": self.title})


class VisHeatmap(VisBase):
    def draw_data(self):
        self.visdom.heatmap(np.flipud(_np(self.raw_data).squeeze()),
                            win=self.title, opts={"title": self.title})


class VisFeaturemap(VisBase):
    """Per-channel heatmaps with a checkbox list (reference visdom.py:67-97):
    data (C, H, W); each enabled channel gets its own heatmap window."""

    def __init__(self, visdom, show_data, title):
        super().__init__(visdom, show_data, title)
        self.block_list = None

    def _handler(self, data):
        if data.get("event_type") != "PropertyUpdate":
            return
        self.block_list[data["propertyId"]]["value"] = data["value"]
        self.visdom.properties(self.block_list,
                               opts={"title": f"{self.title} UI"},
                               win=f"{self.title}_ui")
        self.draw_data()

    def save_data(self, data, **kwargs):
        data = _np(data)
        if data.ndim == 4:
            data = data[0]
        if self.block_list is None:
            self.block_list = [{"type": "checkbox", "name": f"ch {i:04d}",
                                "value": False} for i in range(data.shape[0])]
            try:
                self.visdom.properties(self.block_list,
                                       opts={"title": f"{self.title} UI"},
                                       win=f"{self.title}_ui")
                self.visdom.register_event_handler(self._handler,
                                                   f"{self.title}_ui")
            except Exception:
                pass
        self.raw_data = data

    def draw_data(self):
        if self.block_list is None:
            return
        for i, d in enumerate(self.block_list):
            if d["value"]:
                t = f"{self.title} ch: {i:04d}"
                self.visdom.heatmap(np.flipud(self.raw_data[i]), win=t,
                                    opts={"title": t})


class VisCostVolume(VisBase):
    """(reference visdom.py:100-147): full (H, W, H, W) volume rendered as a tiled
    heatmap, or one slice at the UI-selected reference position."""

    def __init__(self, visdom, show_data, title, flip=False):
        super().__init__(visdom, show_data, title)
        self.show_slice = False
        self.slice_pos = None
        self.flip = flip

    def save_data(self, data, **kwargs):
        data = _np(data).squeeze()
        hw = data.shape[-2:]
        self.raw_data = data.reshape(hw[0], hw[1], hw[0], hw[1])

    def set_zoom_pos(self, pos):
        self.slice_pos = list(pos)

    def toggle_show_slice(self, new_mode=None):
        self.show_slice = (not self.show_slice) if new_mode is None else new_mode

    def draw_data(self):
        d = self.raw_data
        if self.show_slice and self.slice_pos is not None:
            r, c = self.slice_pos
            sl = d[:, :, r, c] if self.flip else d[r, c]
            self.visdom.heatmap(np.flipud(sl), win=self.title,
                                opts={"title": self.title})
            return
        p = d.transpose(0, 2, 1, 3)
        if self.flip:
            p = p.transpose(2, 3, 0, 1)
        p = p.reshape(p.shape[0] * p.shape[1], -1)
        self.visdom.heatmap(np.flipud(p), win=self.title,
                            opts={"title": self.title})


class VisCostVolumeUI(VisBase):
    """Zoom/slice controller (reference visdom.py:150-229): an image with the
    feature grid overlaid; arrow keys move the reference cell, Enter toggles
    slice mode for every registered cost-volume pane."""

    def __init__(self, visdom, show_data, title, feat_shape, registered_blocks):
        super().__init__(visdom, show_data, title)
        self.feat_shape = feat_shape
        self.zoom_mode = False
        self.zoom_pos = [int((feat_shape[0] - 1) / 2), int((feat_shape[1] - 1) / 2)]
        self.registered_blocks = registered_blocks
        try:
            self.visdom.register_event_handler(self._handler, title)
        except Exception:
            pass

    def _handler(self, data):
        zoom_toggled = False
        if data.get("event_type") == "KeyPress":
            key = data.get("key")
            if key == "ArrowRight":
                self.zoom_pos[1] = min(self.zoom_pos[1] + 1, self.feat_shape[1] - 1)
            elif key == "ArrowLeft":
                self.zoom_pos[1] = max(self.zoom_pos[1] - 1, 0)
            elif key == "ArrowUp":
                self.zoom_pos[0] = max(self.zoom_pos[0] - 1, 0)
            elif key == "ArrowDown":
                self.zoom_pos[0] = min(self.zoom_pos[0] + 1, self.feat_shape[0] - 1)
            elif key == "Enter":
                self.zoom_mode = not self.zoom_mode
                zoom_toggled = True
        self.draw_data()
        for block in self.registered_blocks.values():
            if isinstance(block, VisCostVolume):
                block.set_zoom_pos(self.zoom_pos)
                block.toggle_show_slice(self.zoom_mode)
                if (self.zoom_mode or zoom_toggled) and block.show_data:
                    block.draw_data()

    def save_data(self, data, **kwargs):
        # data = (image (H, W, 3), feat_shape)
        self.raw_data = _np(data[0]).astype(np.float32)

    def draw_data(self):
        if self.raw_data is None:
            return
        im = self.raw_data.copy()
        if im.ndim == 3 and im.shape[-1] == 3:
            im = im.transpose(2, 0, 1)
        sr = max(int(im.shape[1] / self.feat_shape[0]), 1)
        sc = max(int(im.shape[2] / self.feat_shape[1]), 1)
        im[:, ::sr, :] = 0
        im[:, :, ::sc] = 0
        im[0, ::sr, :] = 255
        im[0, :, ::sc] = 255
        r1, r2 = self.zoom_pos[0] * sr, min((self.zoom_pos[0] + 1) * sr, im.shape[1])
        c1, c2 = self.zoom_pos[1] * sc, min((self.zoom_pos[1] + 1) * sc, im.shape[2])
        f = 0.8 if self.zoom_mode else 0.5
        red = np.array([255.0, 0.0, 0.0]).reshape(3, 1, 1)
        im[:, r1:r2, c1:c2] = im[:, r1:r2, c1:c2] * (1 - f) + red * f
        self.visdom.image(im, win=self.title, opts={"title": self.title})


class VisInfoDict(VisBase):
    def save_data(self, data, **kwargs):
        if self.raw_data is None:
            self.raw_data = {}
        self.raw_data.update(dict(data))

    def draw_data(self):
        text = "<br>".join(f"<b>{k}</b>: {v}" for k, v in self.raw_data.items())
        self.visdom.text(text, win=self.title, opts={"title": self.title})


class VisText(VisBase):
    def draw_data(self):
        self.visdom.text(str(self.raw_data), win=self.title,
                         opts={"title": self.title})


class VisLinePlot(VisBase):
    def draw_data(self):
        d = self.raw_data
        if isinstance(d, (tuple, list)) and len(d) == 2:
            y, x = _np(d[0]), _np(d[1])
        else:
            y = _np(d)
            x = np.arange(y.shape[0])
        self.visdom.line(y, x, win=self.title, opts={"title": self.title})


def _draw_box(im, box, color, width=2):
    x, y, w, h = [int(round(float(v))) for v in box]
    H, W = im.shape[:2]

    def clip(v, hi):
        return max(0, min(int(v), hi - 1))

    for t in range(width):
        y0, y1 = clip(y + t, H), clip(y + h - t, H)
        x0, x1 = clip(x + t, W), clip(x + w - t, W)
        im[y0, x0:x1 + 1] = color
        im[y1, x0:x1 + 1] = color
        im[y0:y1 + 1, x0] = color
        im[y0:y1 + 1, x1] = color
    return im


_COLORS = [(0, 255, 0), (255, 0, 0), (0, 0, 255), (255, 255, 0), (255, 0, 255),
           (0, 255, 255), (128, 0, 128), (255, 128, 0)]


class VisTracking(VisBase):
    """Image + boxes/masks overlay (reference visdom.py:280-322)."""

    def draw_data(self):
        data = list(self.raw_data)
        im = _np(data[0]).astype(np.float32).copy()
        for i, item in enumerate(data[1:]):
            item = _np(item)
            if item.ndim == 1 and item.size == 4:          # box
                _draw_box(im, item, _COLORS[i % len(_COLORS)])
            elif item.ndim == 2:                            # mask
                color = np.array(_COLORS[i % len(_COLORS)], np.float32)
                m = (item > 0.5).astype(np.float32)[..., None]
                im = im * (1 - 0.5 * m) + 0.5 * m * color
        self.visdom.image(im.transpose(2, 0, 1), win=self.title,
                          opts={"title": self.title})


class VisBBReg(VisBase):
    """Initial vs refined IoU-net boxes (reference visdom.py:325-352)."""

    def draw_data(self):
        im = _np(self.raw_data[0]).astype(np.float32).copy()
        init_boxes = _np(self.raw_data[1]).reshape(-1, 4)
        final_boxes = _np(self.raw_data[2]).reshape(-1, 4)
        for b in init_boxes:
            _draw_box(im, b, (255, 0, 0), width=1)
        for b in final_boxes:
            _draw_box(im, b, (0, 255, 0), width=2)
        self.visdom.image(im.transpose(2, 0, 1), win=self.title,
                          opts={"title": self.title})


_PANES = {
    "image": VisImage,
    "heatmap": VisHeatmap,
    "featmap": VisFeaturemap,
    "cost_volume": VisCostVolume,
    "cost_volume_flip": lambda v, s, t: VisCostVolume(v, s, t, flip=True),
    "info_dict": VisInfoDict,
    "text": VisText,
    "lineplot": VisLinePlot,
    "Tracking": VisTracking,
    "bbreg": VisBBReg,
}


class Visdom:
    """(reference visdom.py:376-434). With no reachable visdom server, panes fall
    back to periodic matplotlib PNG dumps under PYTRACKING_TPU_DEBUG_DIR."""

    def __init__(self, debug: int = 0, ui_info=None,
                 visdom_info: Optional[dict] = None,
                 dump_dir: Optional[str] = None):
        self.debug = debug
        self.dump_dir = dump_dir or os.environ.get("PYTRACKING_TPU_DEBUG_DIR",
                                                   "/tmp/pytracking_tpu_debug")
        self._step = 0
        visdom_info = visdom_info or {}
        self._vis = None
        self.registered_blocks: Dict[str, VisBase] = {}
        self.blocks_list = []
        try:
            import visdom as _visdom
            self._vis = _visdom.Visdom(
                server=visdom_info.get("server", "127.0.0.1"),
                port=visdom_info.get("port", 8097))
            self._vis.properties(self.blocks_list,
                                 opts={"title": "Block List"}, win="block_list")
            self._vis.register_event_handler(self._block_list_handler,
                                             "block_list")
            if ui_info is not None:
                self._vis.register_event_handler(ui_info["handler"],
                                                 ui_info["win_id"])
        except Exception:
            self._vis = None
            os.makedirs(self.dump_dir, exist_ok=True)

    def _block_list_handler(self, data):
        field_name = self.blocks_list[data["propertyId"]]["name"]
        self.registered_blocks[field_name].toggle_display(data["value"])
        self.blocks_list[data["propertyId"]]["value"] = data["value"]
        self._vis.properties(self.blocks_list, opts={"title": "Block List"},
                             win="block_list")

    def register(self, data, mode: str, debug_level: int = 0,
                 title: str = "Data", **kwargs):
        self._step += 1
        if self._vis is None:
            if debug_level <= self.debug:
                self._register_dump(data, mode, title)
            return
        if title not in self.registered_blocks:
            show_data = self.debug >= debug_level
            if title != "Tracking":
                self.blocks_list.append({"type": "checkbox", "name": title,
                                         "value": show_data})
                self._vis.properties(self.blocks_list,
                                     opts={"title": "Block List"},
                                     win="block_list")
            if mode == "cost_volume_ui":
                self.registered_blocks[title] = VisCostVolumeUI(
                    self._vis, show_data, title, data[1], self.registered_blocks)
            elif mode in _PANES:
                self.registered_blocks[title] = _PANES[mode](self._vis, show_data,
                                                             title)
            else:
                raise ValueError(f"Unknown visdom data mode {mode}")
        self.registered_blocks[title].update(data, **kwargs)

    # ------------------------------------------------------------------ headless

    def _register_dump(self, data, mode, title):
        """Headless fallback: periodic PNG/text dumps (per-pane cadence)."""
        if not hasattr(self, "_title_steps"):
            self._title_steps = {}
        step = self._title_steps.get(title, 0)
        self._title_steps[title] = step + 1
        if step % 20 != 0:
            return
        safe = title.replace(" ", "_").replace("/", "_")
        path = os.path.join(self.dump_dir, f"{safe}_{step:06d}")
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            if mode in ("image", "heatmap", "Tracking", "bbreg",
                        "cost_volume_ui"):
                arr = _np(data[0] if mode in ("Tracking", "bbreg",
                                              "cost_volume_ui") else data)
                plt.figure()
                plt.imshow(arr.squeeze().astype(np.float32) /
                           (255.0 if arr.max() > 2 else 1.0))
                plt.title(title)
                plt.savefig(path + ".png")
                plt.close()
            elif mode == "featmap":
                arr = _np(data)
                if arr.ndim == 4:
                    arr = arr[0]
                plt.figure()
                plt.imshow(arr.mean(axis=0))
                plt.title(title + " (channel mean)")
                plt.savefig(path + ".png")
                plt.close()
            elif mode in ("cost_volume", "cost_volume_flip"):
                arr = _np(data).squeeze()
                hw = arr.shape[-2:]
                plt.figure()
                plt.imshow(arr.reshape(hw[0] * hw[1], -1).mean(axis=0
                                                               ).reshape(hw))
                plt.title(title + " (mean over ref positions)")
                plt.savefig(path + ".png")
                plt.close()
            elif mode in ("info_dict", "text"):
                with open(path + ".txt", "w") as f:
                    if mode == "info_dict":
                        for k, v in dict(data).items():
                            f.write(f"{k}: {v}\n")
                    else:
                        f.write(str(data))
            elif mode == "lineplot":
                y = _np(data[0] if isinstance(data, (tuple, list)) else data)
                plt.figure()
                plt.plot(y)
                plt.title(title)
                plt.savefig(path + ".png")
                plt.close()
        except Exception:
            pass
