# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Device-side weighted sampling kernels.

The reference relies on ``np.random.Generator.choice(replace=False, p=...)``
(host, sequential) for batch subsampling (``subsampling.py:202-207``) and for
the per-bitstring repair flips (``configuration_recovery.py:247-301``).  The
equivalent distribution can be produced entirely on device with the
Gumbel-top-k trick: adding i.i.d. Gumbel noise to log-weights and taking the
top-k indices samples k items *without replacement* with probabilities
proportional to the weights — exactly the successive-draw semantics of
``rng.choice(replace=False, p=w)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gumbel_topk_indices", "rank_by_gumbel"]


def gumbel_topk_indices(key, log_weights, k: int):
    """Sample ``k`` indices without replacement, p proportional to exp(log_weights).

    Entries with ``log_weights == -inf`` are never selected (provided at least
    ``k`` finite entries exist).
    """
    g = jax.random.gumbel(key, log_weights.shape, dtype=log_weights.dtype)
    scores = log_weights + g
    _, idx = jax.lax.top_k(scores, k)
    return idx


def rank_by_gumbel(key, log_weights):
    """Per-row descending rank of perturbed log-weights.

    Returns ``ranks`` with the same shape as ``log_weights`` where the entry
    holding the largest ``log_weights + Gumbel`` gets rank 0.  Selecting
    ``ranks < k`` yields a weighted sample of k items without replacement per
    row (Gumbel-top-k), vectorized across rows.
    """
    g = jax.random.gumbel(key, log_weights.shape, dtype=log_weights.dtype)
    scores = jnp.where(jnp.isneginf(log_weights), -jnp.inf, log_weights + g)
    order = jnp.argsort(-scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    return ranks, scores
