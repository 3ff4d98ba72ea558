"""Small math helpers (vectorized counterpart of reference
utils/math_utils.py:6-57)."""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-10


def normalize_vector(vector):
    """Unit-normalize along the last axis; ~zero vectors map to zero
    (reference utils/math_utils.py:6-19)."""
    norm = jnp.linalg.norm(vector, axis=-1, keepdims=True)
    return jnp.where(norm < _EPS, jnp.zeros_like(vector),
                     vector / jnp.where(norm < _EPS, 1.0, norm))


def is_point_in_halfspace(point, h, g):
    """h . p + g <= 0 (reference utils/math_utils.py:21-35)."""
    return jnp.sum(h * point, axis=-1) + g <= 0


def project_point_to_halfspace(point, h, g):
    """Euclidean projection onto {x : h.x + g <= 0}, replicating the
    reference's use of the UN-normalized offset g with a normalized normal
    (reference utils/math_utils.py:37-57)."""
    h_unit = normalize_vector(h)
    signed_dist = jnp.sum(h_unit * point, axis=-1) + g
    proj = point - h_unit * signed_dist[..., None]
    return jnp.where((signed_dist <= 0)[..., None], point, proj)
