"""Plot helpers: tensor display, mask overlay (reference pytracking/utils/plotting.py:
show_tensor, plot_graph, overlay_mask)."""

from __future__ import annotations

import numpy as np


def show_tensor(a, fig_num=None, title=None, range=(None, None), ax=None):
    """Display a 2D array as an image (reference plotting.py:8-34)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    a_np = np.asarray(a).squeeze()
    if ax is None:
        fig = plt.figure(fig_num)
        plt.tight_layout()
        plt.cla()
        plt.imshow(a_np, vmin=range[0], vmax=range[1])
        plt.axis("off")
        if title:
            plt.title(title)
        plt.draw()
        return fig
    ax.cla()
    ax.imshow(a_np, vmin=range[0], vmax=range[1])
    ax.set_axis_off()
    if title:
        ax.set_title(title)


def plot_graph(a, fig_num=None, title=None):
    """Plot a 1D signal (reference plotting.py:37-51)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure(fig_num)
    plt.cla()
    plt.plot(np.asarray(a).squeeze())
    if title:
        plt.title(title)
    plt.draw()
    return fig


_MASK_COLORS = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0],
     [255, 0, 255], [0, 255, 255], [128, 64, 0], [64, 0, 128]], np.float32)


def overlay_mask(im: np.ndarray, mask: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Alpha-blend a label mask over an image (reference plotting.py:54-72)."""
    im = np.asarray(im, np.float32)
    mask = np.asarray(mask)
    out = im.copy()
    for oid in np.unique(mask):
        if oid == 0:
            continue
        color = _MASK_COLORS[int(oid) % len(_MASK_COLORS)]
        region = mask == oid
        out[region] = (1 - alpha) * im[region] + alpha * color
    return out.astype(np.uint8)
