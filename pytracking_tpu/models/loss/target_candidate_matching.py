"""SuperGlue-style assignment NLL for KeepTrack candidate matching.

Re-design of reference `ltr/models/loss/target_candidate_matching_loss.py`
(TargetCandidateMatchingLoss:18): balanced negative log-likelihood of the ground-truth
assignment under the Sinkhorn log-assignment matrix, with dustbin terms for
unmatchable candidates. Operates on fixed candidate slots: gt_matches entries are
-2 = invalid slot (ignored), -1 = unmatchable (dustbin), >= 0 = matched index.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def target_candidate_matching_loss(log_assignment: jnp.ndarray,
                                   gt_assignment: jnp.ndarray,
                                   gt_matches0: jnp.ndarray,
                                   gt_matches1: jnp.ndarray,
                                   bin_score: jnp.ndarray,
                                   nll_balancing: float = 0.5) -> Dict[str, jnp.ndarray]:
    """log_assignment (B, M+1, N+1); gt_assignment (B, M, N) in {0,1};
    gt_matches0 (B, M), gt_matches1 (B, N). Returns dict with 'total' and stats
    (reference target_candidate_matching_loss.py:30-67)."""
    positive = gt_assignment.astype(jnp.float32)
    neg0 = (gt_matches0 == -1).astype(jnp.float32)
    neg1 = (gt_matches1 == -1).astype(jnp.float32)

    num_pos = jnp.maximum(positive.sum(axis=(1, 2)), 1.0)
    num_neg = jnp.maximum(neg0.sum(axis=1) + neg1.sum(axis=1), 1.0)

    nll_pos = -(log_assignment[:, :-1, :-1] * positive).sum(axis=(1, 2)) / num_pos
    nll_neg0 = -(log_assignment[:, :-1, -1] * neg0).sum(axis=1)
    nll_neg1 = -(log_assignment[:, -1, :-1] * neg1).sum(axis=1)
    nll_neg = (nll_neg0 + nll_neg1) / num_neg

    nll = nll_balancing * nll_pos + (1.0 - nll_balancing) * nll_neg
    return {
        "total": nll.mean(),
        "nll_pos": nll_pos.mean(),
        "nll_neg": nll_neg.mean(),
        "num_matchable": num_pos.mean(),
        "num_unmatchable": num_neg.mean(),
        "sinkhorn_norm": jnp.exp(log_assignment)[:, :-1].sum(axis=2).mean(),
        "bin_score": jnp.asarray(bin_score).reshape(()),
    }


def matching_metrics(matches1: jnp.ndarray, gt_matches1: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Match recall/precision (reference target_candidate_matching_loss.py:4-15):
    recall over annotated (gt > -2, i.e. valid) slots; precision over predicted
    matches."""
    valid = gt_matches1 > -2
    correct = (matches1 == gt_matches1) & valid
    recall = correct.sum() / jnp.maximum(valid.sum(), 1)
    predicted = (matches1 > -1) & valid
    precision = (correct & predicted).sum() / jnp.maximum(predicted.sum(), 1)
    return {"match_recall": recall, "match_precision": precision}
