"""Swin Transformer backbone with flexible input sizes (TaMOs-SwinBase).

Re-design of reference `ltr/models/backbone/swin_transformer_flex.py` (718 LoC):
hierarchical windowed attention with shifted windows and patch merging. Inputs of any
size are padded to window multiples (the 'flex' part). Outputs a dict of stage
features: stage1 (stride 4) ... stage4 (stride 32); TaMOs consumes stage2 (stride 8)
and stage3 (stride 16).

TPU notes: window partition is reshape/transpose (layout-friendly); attention within
7×7 windows batches as (num_windows·B, 49, C) — small matmuls that XLA batches onto
the MXU. The relative position bias table is indexed with a static gather.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x (B_, N, C) with N = ws²; mask (nW, N, N) or None."""
        ws = self.window_size
        B_, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x).reshape(
            B_, N, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(0, 1, 3, 2)) * head_dim ** -0.5

        bias_table = self.param("rel_pos_bias",
                                nn.initializers.truncated_normal(0.02),
                                ((2 * ws - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = bias_table[idx.reshape(-1)].reshape(N, N, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, self.num_heads, N, N) + \
                mask[None, :, None]
            attn = attn.reshape(B_, self.num_heads, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(self.dim, name="proj")(out)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _window_reverse(windows, ws, B, H, W):
    C = windows.shape[-1]
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: bool = False
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, C), H/W already padded to window multiples."""
        B, H, W, C = x.shape
        ws = self.window_size
        shift = ws // 2 if self.shift else 0

        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            # attention mask separating wrapped regions
            img_mask = np.zeros((1, H, W, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = _window_partition(jnp.asarray(img_mask), ws)[..., 0]  # (nW, N)
            attn_mask = jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)
        else:
            attn_mask = None

        windows = _window_partition(x, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws, name="attn")(
            windows, attn_mask)
        x = _window_reverse(attn, ws, B, H, W)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class SwinTransformer(nn.Module):
    """Attributes follow Swin-B: embed_dim 128, depths (2,2,18,2),
    heads (4,8,16,32)."""
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 7
    output_layers: Tuple[str, ...] = ("stage2", "stage3")

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        outputs = {}
        # patch embedding, stride 4
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), name="patch_embed")(x)
        x = nn.LayerNorm(name="embed_norm")(x)

        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            # pad to window multiples (the 'flex' input handling)
            H, W = x.shape[1], x.shape[2]
            ws = self.window_size
            ph = (ws - H % ws) % ws
            pw = (ws - W % ws) % ws
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            for b in range(depth):
                xp = SwinBlock(dim, self.num_heads[stage], ws, shift=(b % 2 == 1),
                               name=f"stage{stage + 1}_block{b}")(xp)
            x = xp[:, :H, :W]
            name = f"stage{stage + 1}"
            if name in self.output_layers:
                outputs[name] = x
            if stage < len(self.depths) - 1:
                # patch merging: 2x2 concat + linear reduction
                H2, W2 = (H // 2) * 2, (W // 2) * 2
                xm = x[:, :H2, :W2]
                xm = jnp.concatenate([xm[:, 0::2, 0::2], xm[:, 1::2, 0::2],
                                      xm[:, 0::2, 1::2], xm[:, 1::2, 1::2]], axis=-1)
                xm = nn.LayerNorm(name=f"merge_norm{stage + 1}")(xm)
                x = nn.Dense(2 * dim, use_bias=False,
                             name=f"merge_reduce{stage + 1}")(xm)
                dim *= 2
        return outputs


def swin_base(output_layers=("stage2", "stage3")) -> SwinTransformer:
    return SwinTransformer(output_layers=tuple(output_layers))


def swin_tiny(output_layers=("stage2", "stage3")) -> SwinTransformer:
    return SwinTransformer(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                           output_layers=tuple(output_layers))
