"""Batched Pallas Cholesky/solve kernels vs the XLA reference path.

Off-TPU these run the kernels in interpret mode (same kernel logic,
CPU execution); the TPU worker suite exercises the compiled path
end-to-end through the MPC northstar test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.pallas_linalg import (
    batched_cho_solve, batched_cholesky, chol_factor_b, chol_solve_b)


def _spd_batch(rng, B, n):
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    S = np.einsum("bij,bkj->bik", A, A) + 3.0 * np.eye(n, dtype=np.float32)
    return jnp.asarray(S)


@pytest.mark.parametrize("B,n", [(1, 60), (5, 60), (3, 64), (4, 17)])
def test_batched_cholesky_matches_xla(B, n):
    rng = np.random.default_rng(0)
    S = _spd_batch(rng, B, n)
    L = batched_cholesky(S, interpret=True)
    L_ref = jax.lax.linalg.cholesky(S)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=2e-5, atol=2e-5)
    # Strictly lower-triangular output (no stale upper garbage).
    upper = np.triu(np.asarray(L), k=1)
    assert np.abs(upper).max() == 0.0


@pytest.mark.parametrize("B,n,k", [(4, 60, 0), (2, 60, 5), (3, 64, 65),
                                   (5, 33, 0)])
def test_batched_cho_solve_matches_xla(B, n, k):
    rng = np.random.default_rng(1)
    S = _spd_batch(rng, B, n)
    L = jax.lax.linalg.cholesky(S)
    shape = (B, n) if k == 0 else (B, n, k)
    r = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    x = batched_cho_solve(L, r, interpret=True)
    x_ref = jax.vmap(
        lambda a, b: jax.scipy.linalg.cho_solve((a, True), b))(L, r)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=3e-4, atol=3e-4)


def test_custom_vmap_wrappers_cpu_fallback():
    """Under vmap off-TPU the wrappers take the XLA fallback and match
    per-instance scipy results; unbatched they behave like plain calls."""
    rng = np.random.default_rng(2)
    S = _spd_batch(rng, 6, 60)
    r = jnp.asarray(rng.normal(size=(6, 60)).astype(np.float32))

    L = jax.vmap(chol_factor_b)(S)
    x = jax.vmap(chol_solve_b)(L, r)
    x_ref = jax.vmap(lambda s, b: jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(s), b))(S, r)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=3e-4, atol=3e-4)

    # Unbatched path.
    x1 = chol_solve_b(chol_factor_b(S[0]), r[0])
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x_ref[0]),
                               rtol=3e-4, atol=3e-4)


def test_batched_kernels_inside_jit_and_nested_vmap():
    """The solver calls these inside jit + (sometimes nested) vmap."""
    rng = np.random.default_rng(3)
    S = _spd_batch(rng, 12, 60).reshape(3, 4, 60, 60)
    r = jnp.asarray(rng.normal(size=(3, 4, 60)).astype(np.float32))

    @jax.jit
    def solve_all(S, r):
        return jax.vmap(jax.vmap(
            lambda s, b: chol_solve_b(chol_factor_b(s), b)))(S, r)

    x = solve_all(S, r)
    x_ref = jax.vmap(jax.vmap(lambda s, b: jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(s), b)))(S, r)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=3e-4, atol=3e-4)
