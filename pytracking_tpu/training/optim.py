"""Per-module optimizers matching the reference's torch param groups.

The reference recipes build `optim.Adam([{'params': net.classifier..., 'lr': ...},
...], lr=base)` (e.g. ltr/train_settings/dimp/dimp50.py:108-115): each module gets
its own learning rate, and modules NOT listed in any group are not optimized at
all (frozen). The TPU-native equivalent is `optax.multi_transform` keyed on the
flax param-path prefix, with `optax.set_to_zero()` as the frozen group.

Schedules: StepLR(step_size, gamma) ≙ staircase `optax.exponential_decay`;
MultiStepLR(milestones, gamma) ≙ `optax.piecewise_constant_schedule` — both in
steps of `steps_per_epoch` so the per-epoch semantics match.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import optax


def step_lr(base_lr: float, steps_per_epoch: int, step_size: int = 15,
            gamma: float = 0.2):
    """torch StepLR equivalent (per-epoch staircase decay)."""
    return optax.exponential_decay(base_lr,
                                   transition_steps=step_size *
                                   max(steps_per_epoch, 1),
                                   decay_rate=gamma, staircase=True)


def multi_step_lr(base_lr: float, steps_per_epoch: int,
                  milestones: Sequence[int], gamma: float = 0.2):
    """torch MultiStepLR equivalent."""
    spe = max(steps_per_epoch, 1)
    return optax.piecewise_constant_schedule(
        base_lr, {m * spe: gamma for m in milestones})


def _label_tree(params, prefixes):
    """Assign each param leaf the longest matching module-path prefix (or
    '__base__'). Paths are '/'-joined flax module names, e.g.
    'classifier/filter_optimizer'."""

    def label(path):
        for p in prefixes:
            # a prefix ending in '_' matches raw (flat stage names like
            # 'feature_extractor/layer3_' -> layer3_0, layer3_1, ...)
            if p.endswith("_") and path.startswith(p):
                return p
            if path == p or path.startswith(p + "/"):
                return p
        return "__base__"

    def walk(tree, prefix=""):
        if hasattr(tree, "items"):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        return label(prefix)

    return walk(params)


def adam_per_module(base_lr: float, module_lrs: Dict[str, float],
                    steps_per_epoch: int, step_size: int = 15,
                    gamma: float = 0.2, milestones: Optional[Sequence[int]] = None,
                    weight_decay: Optional[float] = None,
                    freeze_unlisted: bool = False):
    """Adam/AdamW with per-module LRs and a shared decay schedule.

    module_lrs: {'classifier/filter_optimizer': 5e-4, 'feature_extractor': 2e-5,
    ...}. A module mapped to base lr in the reference is simply omitted (it falls
    into the '__base__' group) — unless freeze_unlisted=True, in which case
    unlisted modules receive zero updates (the reference's "not in any param
    group" semantics, e.g. tomp50.py:139-142 trains only head + layer3)."""
    prefixes = sorted(module_lrs, key=len, reverse=True)

    def make(lr):
        sched = multi_step_lr(lr, steps_per_epoch, milestones, gamma) \
            if milestones is not None else \
            step_lr(lr, steps_per_epoch, step_size, gamma)
        if weight_decay is not None:
            return optax.adamw(sched, weight_decay=weight_decay)
        return optax.adam(sched)

    transforms = {p: make(lr) for p, lr in module_lrs.items()}
    transforms["__base__"] = optax.set_to_zero() if freeze_unlisted \
        else make(base_lr)
    return optax.multi_transform(transforms,
                                 lambda params: _label_tree(params, prefixes))
