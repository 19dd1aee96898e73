"""KYS response predictor: propagate the scene state with the cost volume and fuse it
with the appearance-model (DiMP) score.

Re-design of reference `ltr/models/kys/response_predictor.py` (ResponsePredictor:8) and
`utils.py` (shift_features). The propagation step
Σ_prev w(prev, cur) · state(prev) is an (HW × HW) · (HW × D) matmul — MXU-native —
instead of the reference's broadcast-expand-sum over a 5-D tensor.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytracking_tpu.models.kys.conv_gru import ConvGRUCell
from pytracking_tpu.models.layers.blocks import ConvBlock


def shift_features(feat: jnp.ndarray, shift_yx) -> jnp.ndarray:
    """Bilinear sub-pixel shift of (B, H, W, C) by (B, 2) normalized (y, x) offsets
    (reference kys/utils.py shift_features). Positive shift moves content toward
    higher indices. Out-of-image taps contribute ZERO, matching torch
    grid_sample's default zero padding (the reference relies on it: a clamped
    border propagates visibly through the predictor's 3x3 conv stack)."""
    B, H, W, C = feat.shape
    shift_yx = jnp.asarray(shift_yx, jnp.float32).reshape(B, 2)
    featp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def one(f, s):
        yy = jnp.arange(H, dtype=jnp.float32)[:, None] - s[0] * H
        xx = jnp.arange(W, dtype=jnp.float32)[None, :] - s[1] * W
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy = yy - y0
        wx = xx - x0
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yi = y0 + dy
                xi = x0 + dx
                valid = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
                w = jnp.where(dy, wy, 1 - wy) * jnp.where(dx, wx, 1 - wx) * valid
                yi_c = jnp.clip(yi + 1, 0, H + 1).astype(jnp.int32)
                xi_c = jnp.clip(xi + 1, 0, W + 1).astype(jnp.int32)
                out = out + w[..., None] * f[
                    jnp.broadcast_to(yi_c, (H, W)),
                    jnp.broadcast_to(xi_c, (H, W))]
        return out

    return jax.vmap(one)(featp, shift_yx)


class ResponsePredictor(nn.Module):
    state_dim: int = 8
    representation_predictor_dims: Tuple[int, ...] = (64, 32)
    gru_ksz: int = 3
    conf_measure: str = "max"
    dimp_thresh: Optional[float] = None

    @nn.compact
    def __call__(self, cost_volume, state_prev, dimp_score_cur, init_label=None,
                 dimp_thresh: Optional[float] = None, output_window=None,
                 state_valid=None, train: bool = False):
        """cost_volume (B, HW, H, W); state_prev (B, H, W, D) or None;
        dimp_score_cur (B, H, W, 1); init_label (B, H, W, 1) when state_prev is None.

        state_valid: optional traced () bool for the jit-stable tracker path —
        when False, state_prev is replaced with the label-seeded initial state
        (the reference's `state_prev is None` branch, response_predictor.py),
        selected dynamically instead of by Python control flow.

        Returns (fused response (B, H, W, 1), new state (B, H, W, D), aux dict)."""
        if dimp_thresh is None:
            dimp_thresh = self.dimp_thresh
        B, HW, H, W = cost_volume.shape
        aux = {}

        # shared is-target head (params created once, applied to several states)
        k = self.gru_ksz
        pad = [(k // 2, k // 2)] * 2
        it_conv0 = nn.Conv(4, (k, k), padding=pad, name="is_target_0")
        it_conv1 = nn.Conv(1, (k, k), padding=pad, name="is_target_1")

        def is_target(s):
            return it_conv1(nn.relu(it_conv0(s)))

        # process + normalize the cost volume (reference :74-85)
        cv = cost_volume.reshape(-1, H, W, 1)
        cv = ConvBlock(8, 3, batch_norm=True, relu=True, name="cvproc1_0")(cv,
                                                                           train=train)
        cv = ConvBlock(1, 3, batch_norm=True, relu=False, name="cvproc1_1")(cv,
                                                                            train=train)
        cv = jax.nn.softmax(cv.reshape(-1, H * W), axis=1)   # over cur positions
        cv = cv.reshape(-1, H, W, 1)
        cv = ConvBlock(8, 3, batch_norm=True, relu=True, name="cvproc2_0")(cv,
                                                                           train=train)
        cv = ConvBlock(1, 3, batch_norm=True, relu=False, name="cvproc2_1")(cv,
                                                                            train=train)
        w_prop = jax.nn.softmax(cv.reshape(B, HW, H * W), axis=1)  # over prev positions

        if state_prev is None or (state_valid is not None and
                                  init_label is not None):
            init_state = jnp.tanh(nn.Conv(self.state_dim, (3, 3),
                                          padding=[(1, 1), (1, 1)], use_bias=False,
                                          name="init_hidden")(init_label))
            if state_prev is None:
                state_prev = init_state
            else:
                state_prev = jnp.where(state_valid, state_prev, init_state)
        aux["is_target"] = is_target(state_prev)

        # propagate: (B, HW_cur, HW_prev) x (B, HW_prev, D) -> (B, HW_cur, D)
        propagated = jnp.einsum("bpc,bpd->bcd", w_prop,
                                state_prev.reshape(B, HW, self.state_dim),
                                preferred_element_type=jnp.float32)
        propagated_h = propagated.reshape(B, H, W, self.state_dim)
        aux["is_target_after_prop"] = is_target(propagated_h)

        if self.conf_measure == "max":
            conf = w_prop.max(axis=1).reshape(B, H, W, 1)
        elif self.conf_measure == "entropy":
            conf = -(w_prop * jnp.log(w_prop + 1e-4)).sum(axis=1).reshape(B, H, W, 1)
        else:
            conf = None
        aux["propagation_conf"] = conf

        pin = [propagated_h, dimp_score_cur]
        if conf is not None:
            pin.append(conf)
        x = jnp.concatenate(pin, axis=-1)
        for i, d in enumerate(self.representation_predictor_dims):
            x = ConvBlock(d, 3, batch_norm=False, relu=True,
                          name=f"repr{i}")(x, train=train)
        fused = jax.nn.sigmoid(nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                                       name="response_pred")(x))
        aux["fused_score_orig"] = fused

        if dimp_thresh is not None:
            fused = fused * (dimp_score_cur > dimp_thresh)
        if output_window is not None:
            fused = fused * output_window

        scores_cat = jnp.concatenate([dimp_score_cur, fused], axis=-1)
        pooled = scores_cat.max(axis=(1, 2), keepdims=True)
        pooled = jnp.broadcast_to(pooled, scores_cat.shape)
        gru_in = jnp.concatenate([scores_cat, pooled], axis=-1)
        state_new = ConvGRUCell(self.state_dim, self.gru_ksz,
                                name="state_predictor")(gru_in, propagated_h)
        aux["is_target_new"] = is_target(state_new)
        return fused, state_new, aux
