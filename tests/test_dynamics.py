"""Unit tests for core dynamics vs independent NumPy semantics
(reference core/dynamics.py:7-83)."""

import jax.numpy as jnp
import numpy as np

from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.core import (
    condensed_dynamics, create_double_integrator_matrices,
    create_single_integrator_matrices, simulate_linear_system)


def test_double_integrator_matrices():
    dt = 0.2
    A, B, C = create_double_integrator_matrices(dt, dtype=jnp.float64)
    A_exp = np.block([[np.eye(2), dt * np.eye(2)],
                      [np.zeros((2, 2)), np.eye(2)]])
    B_exp = np.block([[0.5 * dt**2 * np.eye(2)], [dt * np.eye(2)]])
    C_exp = np.block([np.eye(2), np.zeros((2, 2))])
    np.testing.assert_allclose(A, A_exp)
    np.testing.assert_allclose(B, B_exp)
    np.testing.assert_allclose(C, C_exp)


def test_single_integrator_matrices():
    A, B, C = create_single_integrator_matrices(0.2, dtype=jnp.float64)
    np.testing.assert_allclose(A, np.eye(2))
    np.testing.assert_allclose(B, 0.2 * np.eye(2))
    np.testing.assert_allclose(C, np.eye(2))


def test_rollout_matches_numpy_loop():
    rng = np.random.default_rng(0)
    A, B, C = create_double_integrator_matrices(0.2, dtype=jnp.float64)
    A_np, B_np, C_np = np.asarray(A), np.asarray(B), np.asarray(C)
    x0 = rng.normal(size=4)
    u = rng.normal(size=(30, 2))

    xs, ys = simulate_linear_system(jnp.asarray(x0), jnp.asarray(u), A, B, C)

    x_exp = np.zeros((31, 4))
    x_exp[0] = x0
    for t in range(30):
        x_exp[t + 1] = A_np @ x_exp[t] + B_np @ u[t]
    np.testing.assert_allclose(xs, x_exp, atol=1e-12)
    np.testing.assert_allclose(ys, x_exp @ C_np.T, atol=1e-12)


def test_condensed_dynamics_consistency():
    """X = Phi x0 + Gamma U must equal the step-by-step rollout."""
    rng = np.random.default_rng(1)
    A, B, C = create_double_integrator_matrices(0.2, dtype=jnp.float64)
    H = 12
    Phi, Gamma = condensed_dynamics(A, B, H)
    x0 = rng.normal(size=4)
    u = rng.normal(size=(H, 2))
    xs, _ = simulate_linear_system(jnp.asarray(x0), jnp.asarray(u), A, B, C)
    X = np.asarray(Phi) @ x0 + np.asarray(Gamma) @ u.reshape(-1)
    np.testing.assert_allclose(X.reshape(H, 4), np.asarray(xs)[1:], atol=1e-12)
