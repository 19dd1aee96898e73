"""SuperGlue-style attentional GNN matcher with Sinkhorn optimal transport
(KeepTrack's target-candidate association).

Re-design of reference `ltr/models/target_candidate_matching/superglue.py`
(KeypointEncoder:113, AttentionalGNN:180, log_optimal_transport:204, SuperGlue:244).
Candidate sets have a FIXED slot count with a validity mask (the reference uses dynamic
candidate counts; fixed slots + masking is the jit-stable formulation): invalid slots
get large negative match scores so optimal transport routes them to the dustbin.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP1d(nn.Module):
    """Tokenwise MLP with BN+ReLU between layers (reference superglue.py:88-98)."""
    dims: Tuple[int, ...]
    do_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"lin{i}")(x)
            if i < len(self.dims) - 1:
                if self.do_bn:
                    shp = x.shape
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     name=f"bn{i}")(x.reshape(-1, shp[-1])
                                                    ).reshape(shp)
                x = nn.relu(x)
        return x


def normalize_keypoints(kpts: jnp.ndarray, image_shape) -> jnp.ndarray:
    """(reference superglue.py:101-110): center + scale by 0.7·max(size)."""
    h, w = image_shape
    size = jnp.array([w, h], jnp.float32)
    c = size / 2
    f = size.max() * 0.7
    return (kpts - c) / f


class KeypointEncoder(nn.Module):
    """(x, y, score) -> descriptor-space embedding (reference superglue.py:113-121)."""
    feature_dim: int
    layers: Tuple[int, ...] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, kpts, scores, train: bool = False):
        x = jnp.concatenate([kpts, scores[..., None]], axis=-1)
        return MLP1d(tuple(self.layers) + (self.feature_dim,),
                     name="encoder")(x, train=train)


class MultiHeadedAttention(nn.Module):
    num_heads: int
    d_model: int

    @nn.compact
    def __call__(self, query, key, value):
        """(B, N, C) tokens."""
        dim = self.d_model // self.num_heads
        q = nn.Dense(self.d_model, name="proj_q")(query)
        k = nn.Dense(self.d_model, name="proj_k")(key)
        v = nn.Dense(self.d_model, name="proj_v")(value)

        def split(x):
            # torch layout (reference superglue.py:41-46): channels split as
            # (head_dim, heads) — head index fastest — so ported proj/merge
            # weights keep their channel grouping
            return x.reshape(x.shape[:-1] + (dim, self.num_heads))

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bndh,bmdh->bhnm", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dim)
        prob = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bmdh->bndh", prob, v,
                         preferred_element_type=jnp.float32)
        return nn.Dense(self.d_model, name="merge")(
            out.reshape(out.shape[:-2] + (self.d_model,)))


class AttentionalPropagation(nn.Module):
    d_model: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, source, train: bool = False):
        message = MultiHeadedAttention(self.num_heads, self.d_model,
                                       name="attn")(x, source, source)
        return MLP1d((self.d_model * 2, self.d_model),
                     name="mlp")(jnp.concatenate([x, message], axis=-1), train=train)


class AttentionalGNN(nn.Module):
    feature_dim: int
    layer_types: Tuple[str, ...] = ("self", "cross") * 9

    @nn.compact
    def __call__(self, desc0, desc1, train: bool = False):
        for i, lt in enumerate(self.layer_types):
            upd = AttentionalPropagation(self.feature_dim, name=f"layer{i}")
            if lt == "cross":
                src0, src1 = desc1, desc0
            else:
                src0, src1 = desc0, desc1
            desc0 = desc0 + upd(desc0, src0, train=train)
            desc1 = desc1 + upd(desc1, src1, train=train)
        return desc0, desc1


def log_sinkhorn_iterations(Z, log_mu, log_nu, iters: int):
    """(reference superglue.py:197-202), as a lax.scan."""

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return (u, v), None

    (u, v), _ = jax.lax.scan(body, (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)),
                             None, length=iters)
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores: jnp.ndarray, alpha: jnp.ndarray,
                          iters: int) -> jnp.ndarray:
    """Differentiable optimal transport with dustbins (reference superglue.py:204-224).
    scores (B, M, N); returns (B, M+1, N+1) log assignment."""
    b, m, n = scores.shape
    bins0 = jnp.broadcast_to(alpha, (b, m, 1))
    bins1 = jnp.broadcast_to(alpha, (b, 1, n))
    alpha_c = jnp.broadcast_to(alpha, (b, 1, 1))
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, bins0], -1),
         jnp.concatenate([bins1, alpha_c], -1)], 1)

    norm = -jnp.log(float(m + n))
    log_mu = jnp.concatenate([jnp.full((m,), norm),
                              jnp.array([math.log(n) + norm])])
    log_nu = jnp.concatenate([jnp.full((n,), norm),
                              jnp.array([math.log(m) + norm])])
    log_mu = jnp.broadcast_to(log_mu, (b, m + 1))
    log_nu = jnp.broadcast_to(log_nu, (b, n + 1))
    Z = log_sinkhorn_iterations(couplings, log_mu, log_nu, iters)
    return Z - norm


class SuperGlueMatcher(nn.Module):
    """The matcher head (reference SuperGlue:244-380 _forward)."""
    input_dim: int = 256
    descriptor_dim: int = 256
    keypoint_encoder: Tuple[int, ...] = (32, 64, 128, 256)
    num_gnn_layers: int = 9
    num_sinkhorn_iterations: int = 10
    image_shape: Tuple[int, int] = (288, 288)

    @nn.compact
    def __call__(self, img_coords0, img_coords1, desc0, desc1, scores0, scores1,
                 valid0=None, valid1=None, train: bool = False):
        """coords (B, K, 2) (x, y) image coords; desc (B, K, C); scores (B, K);
        valid (B, K) bool. Returns dict with log assignment matrix (B, K+1, K+1) and
        match probabilities."""
        if self.input_dim != self.descriptor_dim:
            input_proj = nn.Dense(self.descriptor_dim, name="input_proj")
            desc0 = input_proj(desc0)
            desc1 = input_proj(desc1)

        kenc = KeypointEncoder(self.descriptor_dim, self.keypoint_encoder, name="kenc")
        desc0 = desc0 + kenc(normalize_keypoints(img_coords0, self.image_shape),
                             scores0, train=train)
        desc1 = desc1 + kenc(normalize_keypoints(img_coords1, self.image_shape),
                             scores1, train=train)

        desc0, desc1 = AttentionalGNN(
            self.descriptor_dim, ("self", "cross") * self.num_gnn_layers,
            name="gnn")(desc0, desc1, train=train)

        final_proj = nn.Dense(self.descriptor_dim, name="final_proj")
        mdesc0 = final_proj(desc0)
        mdesc1 = final_proj(desc1)

        sim = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1,
                         preferred_element_type=jnp.float32) / \
            self.descriptor_dim ** 0.5

        # invalid slots -> strongly negative so OT routes them to the dustbin
        if valid0 is not None:
            sim = jnp.where(valid0[:, :, None], sim, -1e4)
        if valid1 is not None:
            sim = jnp.where(valid1[:, None, :], sim, -1e4)

        bin_score = self.param("bin_score", lambda k: jnp.asarray(1.0))
        log_assignment = log_optimal_transport(sim, bin_score,
                                               self.num_sinkhorn_iterations)
        return {"log_assignment": log_assignment,
                "matches0_prob": jnp.exp(log_assignment[:, :-1, :-1]),
                "similarity": sim}
