"""Planner tests vs independent NumPy semantics
(reference simulation/planner.py:36-197)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.core.dynamics import (
    create_double_integrator_matrices)
from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.planner import (
    Planner, plan_trajectory, straight_line_trajectory)

DT, H = 0.2, 30


@pytest.fixture(scope="module")
def planner():
    A, B, C = create_double_integrator_matrices(DT, dtype=jnp.float64)
    return Planner(A, B, C, 2.0, 1.0, H, DT)


def _numpy_straight_line(start, goal, H, dt, velocity, A, B):
    """Independent replication of reference planner.py:120-197."""
    direction = goal - start
    distance = np.linalg.norm(direction)
    direction = direction / distance
    n_steps = int(distance / velocity / dt)
    x_ref = np.zeros((H + 1, 4))
    x_ref[0, :2] = start
    for t in range(1, H + 1):
        if t <= n_steps:
            progress = t / n_steps
            x_ref[t, :2] = start + progress * (goal - start)
            x_ref[t, 2:] = velocity * direction
        else:
            x_ref[t, :2] = goal
    u_ref = np.zeros((H, 2))
    B_pinv = np.linalg.pinv(B)
    for t in range(H):
        u_ref[t] = B_pinv @ (x_ref[t + 1] - A @ x_ref[t])
    return x_ref, u_ref


def test_straight_line_matches_reference_semantics(planner):
    start = np.array([-4.0, 0.0])
    goal = np.array([4.0, 0.0])
    x_ref, u_ref, info = straight_line_trajectory(
        planner, jnp.asarray(start), jnp.asarray(goal), 1.5)
    x_exp, u_exp = _numpy_straight_line(start, goal, H, DT, 1.5,
                                        np.asarray(planner.A),
                                        np.asarray(planner.B))
    np.testing.assert_allclose(np.asarray(x_ref), x_exp, atol=1e-10)
    np.testing.assert_allclose(np.asarray(u_ref), u_exp, atol=1e-9)
    assert int(info["n_steps"]) == int(8.0 / 1.5 / DT)


def test_straight_line_diagonal(planner):
    start = np.array([-3.0, 1.5])
    goal = np.array([2.0, -2.0])
    x_ref, u_ref, _ = straight_line_trajectory(
        planner, jnp.asarray(start), jnp.asarray(goal), 1.5)
    x_exp, u_exp = _numpy_straight_line(start, goal, H, DT, 1.5,
                                        np.asarray(planner.A),
                                        np.asarray(planner.B))
    np.testing.assert_allclose(np.asarray(x_ref), x_exp, atol=1e-10)
    np.testing.assert_allclose(np.asarray(u_ref), u_exp, atol=1e-9)


def test_straight_line_degenerate(planner):
    """start == goal -> stationary trajectory, zero inputs
    (reference planner.py:146-155)."""
    start = np.array([1.0, 2.0])
    x_ref, u_ref, _ = straight_line_trajectory(
        planner, jnp.asarray(start), jnp.asarray(start), 1.5)
    x = np.asarray(x_ref)
    np.testing.assert_allclose(x[:, :2], np.tile(start, (H + 1, 1)),
                               atol=1e-12)
    np.testing.assert_allclose(x[:, 2:], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(u_ref), 0.0, atol=1e-12)


def test_plan_trajectory_unconstrained_reaches_goal(planner):
    """The QP planner (restored dead code, reference planner.py:36-118)
    tracks the goal state; with no constraints the condensed Newton
    solution must satisfy the KKT system of the tracking QP."""
    x0 = jnp.asarray([-4.0, 0.0, 0.0, 0.0])
    goal = jnp.asarray([4.0, 0.0, 0.0, 0.0])
    x_ref, u_ref, info = plan_trajectory(planner, x0, goal)
    assert bool(info["converged"])
    x = np.asarray(x_ref)
    # Dynamics consistency
    A, B = np.asarray(planner.A), np.asarray(planner.B)
    u = np.asarray(u_ref)
    for t in range(H):
        np.testing.assert_allclose(x[t + 1], A @ x[t] + B @ u[t],
                                   atol=1e-9)
    # Converges toward the goal
    assert np.linalg.norm(x[-1] - np.asarray(goal)) < 0.5


def test_plan_trajectory_with_bounds(planner):
    x0 = jnp.asarray([-4.0, 0.0, 0.0, 0.0])
    goal = jnp.asarray([4.0, 0.0, 0.0, 0.0])
    u_lim = np.array([0.3, 0.3])
    x_ref, u_ref, info = plan_trajectory(
        planner, x0, goal,
        input_bounds=(jnp.asarray(-u_lim), jnp.asarray(u_lim)),
        state_bounds=(jnp.asarray([-10.0, -10.0, -5.0, -5.0]),
                      jnp.asarray([10.0, 10.0, 5.0, 5.0])),
        has_bounds=True)
    assert bool(info["converged"])
    assert (np.abs(np.asarray(u_ref)) <= 0.3 + 1e-7).all()
