"""End-to-end pipeline property tests (reference main.py:19-186 flow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu as dct
from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.config import (
    Parameters, get_parameters, get_scenario_config)
from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.pipeline import (
    METRICS, make_statics, run_single_scenario)

# Short-sim parameters keep CPU tests fast while exercising every stage.
FAST = Parameters(horizon=10, sim_time=4.0, num_samples=10)


@pytest.fixture(scope="module")
def head_on_result():
    scenario = get_scenario_config("head_on")
    return run_single_scenario(scenario, FAST, seed=42, dtype=jnp.float64)


def test_qp_converges(head_on_result):
    assert bool(head_on_result.qp_converged.all())
    assert not bool(head_on_result.used_fallback.any())


def test_filtered_satisfies_dynamics(head_on_result):
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.core.dynamics import (
        create_double_integrator_matrices)
    A, B, _ = create_double_integrator_matrices(FAST.dt, dtype=jnp.float64)
    A, B = np.asarray(A), np.asarray(B)
    for i in range(3):
        x = np.asarray(head_on_result.filtered_x[i])
        u = np.asarray(head_on_result.filtered_u[i])
        for t in range(FAST.horizon):
            np.testing.assert_allclose(x[t + 1], A @ x[t] + B @ u[t],
                                       atol=1e-9)


def test_input_bounds(head_on_result):
    u = np.asarray(head_on_result.filtered_u)
    assert (np.abs(u) <= 5.0 + 1e-6).all()


def test_initial_state_pinned(head_on_result):
    x0 = np.array([-4.0, 0.0, 0.0, 0.0])
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(head_on_result.filtered_x[i][0]), x0, atol=1e-12)


def test_metric_ordering_of_conservatism(head_on_result):
    """DR-CVaR offsets are strictly larger than CVaR-with-matching-
    convention: g_dr + r~ = g_cvar + eps/alpha > g_cvar (structural)."""
    hs = head_on_result.halfspaces
    r_tilde = (FAST.robot_radius + FAST.obstacle_radius)
    g_dr_star = np.asarray(hs.dr_cvar.g_tilde) + r_tilde
    g_cv = np.asarray(hs.cvar.g_tilde)
    np.testing.assert_allclose(g_dr_star, g_cv + FAST.epsilon / FAST.alpha,
                               atol=1e-9)


def test_deterministic_given_key():
    scenario = get_scenario_config("head_on")
    r1 = run_single_scenario(scenario, FAST, seed=7, dtype=jnp.float64)
    r2 = run_single_scenario(scenario, FAST, seed=7, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(r1.filtered_u),
                                  np.asarray(r2.filtered_u))


@pytest.mark.parametrize("name", ["overtaking", "intersection",
                                  "multi_obstacle"])
def test_all_scenarios_run(name):
    scenario = get_scenario_config(name)
    res = run_single_scenario(scenario, FAST, seed=1, dtype=jnp.float64)
    assert res.filtered_x.shape == (3, FAST.horizon + 1, 4)
    assert res.distances.shape[0] == 3
    assert bool(res.qp_converged.all()), "QP should converge on scenarios"


def test_paper_preset_scenarios():
    scenario = get_scenario_config("head_on", preset="paper")
    params = get_parameters("paper")
    assert params.alpha == 0.1
    assert scenario.sim_time == 3.0
    fast_paper = Parameters(alpha=0.1, horizon=10, sim_time=3.0,
                            num_samples=10)
    res = run_single_scenario(scenario, fast_paper, dtype=jnp.float64)
    assert bool(res.qp_converged.all())


def test_monte_carlo_smoke():
    scenario = get_scenario_config("head_on")
    result = dct.evaluation.run_monte_carlo_simulation(
        scenario, FAST, n_runs=5, seed=0, dtype=jnp.float64)
    assert result.min_distances.shape == (5, 4)
    assert result.collision_probs.shape == (4,)
    summary = result.summary()
    assert set(summary) == {"mean", "cvar", "dr_cvar", "reference"}


def test_distance_matches_manual(head_on_result):
    """Distance-to-collision equals the direct formula
    (reference simulation/environment.py:108-140)."""
    env_r = FAST.robot_radius + FAST.obstacle_radius
    x = np.asarray(head_on_result.filtered_x[2])
    obs = np.asarray(head_on_result.obstacles.realization)
    T = min(len(x), obs.shape[1])
    expected = np.full(T, np.inf)
    for t in range(T):
        for i in range(obs.shape[0]):
            d = np.linalg.norm(x[t, :2] - obs[i, t]) - env_r
            expected[t] = min(expected[t], d)
    np.testing.assert_allclose(
        np.asarray(head_on_result.distances[2])[:T], expected, atol=1e-9)


def test_paper_preset_short_sim_time_runs():
    """Per-scenario sim_time < horizon*dt (paper presets): halfspaces
    exist only for the simulated steps; the MPC pads the remaining
    horizon with inactive constraints (reference core/mpc_filter.py:119
    skips those rows).  Regression: this crashed with a reshape error
    before round 4."""
    import dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu as dct

    params = dct.config.get_parameters("paper")
    sc = dct.config.get_scenario_config("head_on", "paper")
    assert sc.sim_time == 3.0  # shorter than horizon*dt = 6 s
    res = dct.models.run_single_scenario(sc, params, seed=42,
                                         dtype=jnp.float32)
    n_hs = int(sc.sim_time / params.dt) + 1
    assert res.halfspaces.mean.h.shape[0] == n_hs
    assert bool(res.qp_converged.all())
    # Padded rows must not bind: slack beyond the simulated steps is 0.
    assert float(jnp.abs(res.slack[:, n_hs:, :]).max()) == 0.0
    assert np.isfinite(np.asarray(res.distances)).all()
