"""Tracker interface.

Re-design of reference `pytracking/tracker/base/basetracker.py` (BaseTracker:3):
`initialize(image, info) -> dict` and `track(image, info) -> dict` with dict outputs
containing 'target_bbox' (x, y, w, h) and optionally 'segmentation',
'object_presence_score'.

TPU-first contract: concrete trackers keep ALL per-frame state in a fixed-shape pytree
and implement the per-frame computation as a single jitted function
`(state, image) -> (state, out)`. The host-side `track` wrapper only uploads the frame
and reads back the (small) output dict — device→host sync is one bbox per frame, and the
returned arrays can be fetched asynchronously by the harness.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _shape_bucket_granularity() -> int:
    """Bucket granularity for frame-shape padding (0 disables).

    Each compiled track step is specialized on the static frame shape; a
    heterogeneous benchmark sweep (LaSOT mixes 720p/480p/360p/odd sizes) would
    otherwise pay one full XLA compile per distinct shape (the reference's eager
    torch trackers pay zero compile — running.py:138 runs cold). Rounding H and W
    up to the next multiple of the granularity collapses nearby shapes onto one
    program. Padding is edge-replicate, so replicate-border patch reads are
    unchanged; the true size is threaded through the jit as a traced (2,) array
    for the 'inside' border modes and position clamping.

    Parsed and validated ONCE per tracker (in BaseTracker.__init__): a malformed
    PYTRACKING_TPU_SHAPE_BUCKETS fails at construction, not mid-sequence, and
    changing the env var mid-sequence cannot mix bucketed/unbucketed frames
    against a fixed state.image_sz."""
    raw = os.environ.get("PYTRACKING_TPU_SHAPE_BUCKETS", "128")
    try:
        g = int(raw)
    except ValueError as e:
        raise ValueError(
            f"PYTRACKING_TPU_SHAPE_BUCKETS must be an integer, got {raw!r}") from e
    if g < 0:
        raise ValueError(
            f"PYTRACKING_TPU_SHAPE_BUCKETS must be >= 0, got {g}")
    return g


class BaseTracker:
    multiobj_mode = "parallel"
    predicts_segmentation_mask = False
    # VOS trackers (image-shaped mask outputs threaded through the multi-object
    # merge) opt out of frame-shape bucketing — their benchmarks (DAVIS 480p,
    # YT-VOS) are shape-homogeneous, so the compile win is marginal and the
    # padded-mask plumbing isn't worth it.
    supports_shape_buckets = True

    def __init__(self, params):
        self.params = params
        self.visdom = None
        self._debug_outputs = False
        # parse/validate once per tracker lifetime (fail fast on malformed env,
        # immune to mid-sequence env changes)
        self._bucket_granularity = _shape_bucket_granularity()

    def _prepare_image(self, image) -> Tuple[np.ndarray, Tuple[int, int]]:
        """Pad a host frame (H, W[, C]) up to its shape bucket with edge-replicate
        padding. Returns (padded array, true (H, W)). With bucketing disabled
        (PYTRACKING_TPU_SHAPE_BUCKETS=0) this is the identity."""
        arr = np.asarray(image)
        h, w = int(arr.shape[0]), int(arr.shape[1])
        g = self._bucket_granularity
        if g <= 0 or not self.supports_shape_buckets:
            return arr, (h, w)
        hb, wb = -(-h // g) * g, -(-w // g) * g
        if (hb, wb) == (h, w):
            return arr, (h, w)
        pad = [(0, hb - h), (0, wb - w)] + [(0, 0)] * (arr.ndim - 2)
        return np.pad(arr, pad, mode="edge"), (h, w)

    def enable_debug_outputs(self):
        """Include per-frame debug arrays (score maps, sample geometry) in the
        track() output dict — for the visdom live-debug UI (reference trackers
        register score maps via self.visdom, e.g. dimp.py:120-128) and for
        trace-diff tests. Must be called BEFORE the first initialize()/track():
        the flag is read at jit trace time, so flipping it after the step has
        been compiled has no effect."""
        self._debug_outputs = True

    def _jit_with_variables(self, impl, donate_state: bool = False):
        """jit an impl method with the network variables passed as the FIRST argument
        instead of closed over via `self.variables`.

        Closing over the variables bakes every parameter into the compiled program as
        a literal constant — for a ResNet-50-sized net that is a multi-hundred-MB HLO
        (slow compiles, duplicated per jitted function, and over the axon remote
        compile service's request size limit). During tracing, `self.variables` is
        temporarily rebound to the tracer pytree so all helper methods route through
        the jit argument."""
        import jax

        tracker = self

        def wrapped(variables, *args):
            prev = tracker.variables
            tracker.variables = variables
            try:
                return impl(*args)
            finally:
                tracker.variables = prev

        return jax.jit(wrapped, donate_argnums=(1,) if donate_state else ())

    def initialize(self, image, info: Dict[str, Any]) -> Optional[dict]:
        raise NotImplementedError

    def track(self, image, info: Optional[dict] = None) -> dict:
        raise NotImplementedError

    # ---- async pipelining API -------------------------------------------------
    # JAX dispatch is asynchronous: `track_async` uploads the frame and enqueues the
    # jitted step, returning un-materialized device outputs; `fetch_output` blocks and
    # converts. A harness that fetches frame t-1's output after dispatching frame t
    # hides the device/tunnel round-trip behind compute (SURVEY.md §7.3 item 4).

    def track_async(self, image, info: Optional[dict] = None):
        return self.track(image, info)

    def fetch_output(self, handle) -> dict:
        return handle
