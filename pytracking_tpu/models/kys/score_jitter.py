"""Score-map jittering augmentation for KYS training.

Re-design of the reference ``DiMPScoreJittering``
(/root/reference/ltr/models/kys/utils.py:35-79, consumed at
/root/reference/ltr/train_settings/kys/kys.py:136-140): during training the
appearance-model (DiMP) score maps fed to the scene-propagation predictor are
randomly corrupted — either a distractor peak is enhanced to rival the target
peak, or the whole map is zeroed — so the propagation module learns not to
blindly trust the appearance model.

TPU-native differences from the reference:
  * pure function of an explicit ``jax.random`` key (no hidden RNG state), so
    the whole actor remains jittable and reproducible;
  * fully vectorised over the leading map axes (the reference loops over score
    maps in Python to write the enhanced distractor value).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DiMPScoreJittering:
    """Randomly enhance distractor peaks / blank target peaks in score maps.

    Matches reference semantics per score map (ltr/models/kys/utils.py:48-79):
      * ``score_neg`` = scores where label < 1e-4 (background),
        ``score_pos`` = scores where label > 0.2 (target region);
      * with probability ``p_distractor`` AND if the best background peak
        exceeds ``distractor_ratio`` × the target peak, the background argmax
        is overwritten with a uniform sample in
        [min_factor, max_factor] × target peak;
      * otherwise, with probability ``p_zero`` the map is zeroed entirely.
    """

    p_zero: float = 0.0
    distractor_ratio: float = 1.0
    p_distractor: float = 0.0
    max_distractor_enhance_factor: float = 1.0
    min_distractor_enhance_factor: float = 0.75

    def __call__(self, key: jax.Array, score: jax.Array,
                 label: jax.Array) -> jax.Array:
        """score, label: (..., H, W) or (..., H, W, 1); all leading axes are
        independent score maps. Returns the jittered scores, same shape."""
        shape = score.shape
        spatial = shape[-3:] if shape[-1] == 1 else shape[-2:]
        n_map = 1
        for d in shape[:len(shape) - len(spatial)]:
            n_map *= d
        s = score.reshape(n_map, -1)
        l = jnp.broadcast_to(label, shape).reshape(n_map, -1)

        k_roll, k_enh, k_zero = jax.random.split(key, 3)
        dist_roll = jax.random.uniform(k_roll, (n_map,))
        zero_roll = jax.random.uniform(k_zero, (n_map,))

        score_neg = s * (l < 1e-4)
        score_pos = s * (l > 0.2)
        target_max = score_pos.max(axis=1)
        dist_max = score_neg.max(axis=1)
        dist_id = jnp.argmax(score_neg, axis=1)

        jitter = (dist_roll < self.p_distractor) & \
            (dist_max / target_max > self.distractor_ratio)
        zero = (zero_roll < self.p_zero) & ~jitter

        lo = target_max * self.min_distractor_enhance_factor
        hi = target_max * self.max_distractor_enhance_factor
        enhance = jax.random.uniform(k_enh, (n_map,)) * (hi - lo) + lo

        onehot = jax.nn.one_hot(dist_id, s.shape[1], dtype=s.dtype)
        s_enh = s * (1.0 - onehot) + enhance[:, None] * onehot

        out = jnp.where(jitter[:, None], s_enh,
                        jnp.where(zero[:, None], jnp.zeros_like(s), s))
        return out.reshape(shape)
