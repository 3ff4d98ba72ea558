"""Safety evaluation metrics (reference evaluation/metrics.py:6-66).

Dead code in the reference's live tree (its only caller, the Monte Carlo
module, was deleted); restored here as a first-class, vectorized API used
by evaluation/monte_carlo.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def collision_rate(distances, axis=None):
    """Fraction of runs with distance < 0 (reference evaluation/metrics.py:6-16)."""
    return jnp.mean(distances < 0, axis=axis)


def expectation_of_shortfall(distances, threshold: float = 0.0, axis=-1):
    """Mean shortfall below threshold; 0 when no shortfalls
    (reference evaluation/metrics.py:18-32)."""
    mask = distances < threshold
    count = jnp.sum(mask, axis=axis)
    total = jnp.sum(jnp.where(mask, distances - threshold, 0.0), axis=axis)
    return jnp.where(count == 0, 0.0, total / jnp.maximum(count, 1))


def safety_metrics(distances, threshold: float = 0.0):
    """Summary-statistic dict (reference evaluation/metrics.py:34-66)."""
    d = jnp.asarray(distances)
    return {
        "mean": jnp.mean(d),
        "min": jnp.min(d),
        "max": jnp.max(d),
        "std": jnp.std(d),
        "collision_rate": collision_rate(d),
        "expected_shortfall": expectation_of_shortfall(d, threshold),
        "q10": jnp.percentile(d, 10),
        "q25": jnp.percentile(d, 25),
        "median": jnp.median(d),
        "q75": jnp.percentile(d, 75),
        "q90": jnp.percentile(d, 90),
    }
