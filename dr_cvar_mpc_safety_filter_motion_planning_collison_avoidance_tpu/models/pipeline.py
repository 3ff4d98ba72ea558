"""End-to-end safety-filtering pipeline, fully jitted and batchable.

This is the flagship "model" of the framework: the complete reference
call stack main.run_single_scenario (reference main.py:19-186) --
obstacle generation -> straight-line planning -> halfspace construction
under all three risk metrics -> MPC filtering per metric -> signed
distance evaluation -- compiled into a single XLA program.  The three
risk metrics run as one vmapped MPC solve (a batch axis, not a Python
loop as in reference main.py:108-118).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Parameters, Scenario
from ..simulation.environment import (Environment, SafeHalfspaces,
                                      compute_distance_to_collision,
                                      compute_safe_halfspaces_for_trajectory)
from ..simulation.obstacles import ObstacleData, generate_obstacle_scenarios
from .mpc_filter import MPCProblem, build_mpc_problem, _filter_core
from .planner import Planner, straight_line_trajectory
from ..core.dynamics import simulate_linear_system

METRICS = ("mean", "cvar", "dr_cvar")

# Bounds hard-coded at reference main.py:55-57.
STATE_BOUNDS = (np.array([-10.0, -10.0, -5.0, -5.0]),
                np.array([10.0, 10.0, 5.0, 5.0]))
INPUT_BOUNDS = (np.array([-5.0, -5.0]), np.array([5.0, 5.0]))


class PipelineStatics(NamedTuple):
    """Host-side static objects shared across solves (identity-hashed)."""

    env: Environment
    planner: Planner
    mpc: MPCProblem


class ScenarioResult(NamedTuple):
    """Outputs of one scenario run.

    Stacked metric axis ordering follows METRICS = (mean, cvar, dr_cvar).
    """

    x_ref: jax.Array            # [H+1, n]
    u_ref: jax.Array            # [H, m]
    filtered_x: jax.Array       # [3, H+1, n]
    filtered_u: jax.Array       # [3, H, m]
    slack: jax.Array            # [3, H, n_obs]
    qp_converged: jax.Array     # [3] bool
    used_fallback: jax.Array    # [3] bool
    objective: jax.Array        # [3]
    # Per-solve introspection, the in-memory replacement for the
    # reference's tmp/timing_info_*.json side channel (reference
    # core/risk_metrics.py:16-33, core/halfspaces.py:142-148).
    qp_iterations: jax.Array    # [3] int32 IPM iterations per metric
    qp_gap: jax.Array           # [3] final complementarity gap
    wall_time_ms: jax.Array     # [] host wall time; -1 inside jit,
                                # filled by run_single_scenario
    distances: jax.Array        # [3, T] per-metric distance to collision
    reference_distance: jax.Array   # [T] unfiltered reference distance
    halfspaces: SafeHalfspaces  # batch [H, n_obs]
    obstacles: ObstacleData

    def distance_for(self, metric: str):
        return self.distances[METRICS.index(metric)]


def make_statics(scenario: Scenario, params: Parameters,
                 dtype=jnp.float32) -> PipelineStatics:
    """Build the static environment/planner/MPC objects for a scenario
    shape (n_obstacles) and parameter preset."""
    env = Environment(
        robot_radius=params.robot_radius,
        obstacle_radius=params.obstacle_radius,
        horizon=params.horizon,
        dt=params.dt,
        alpha=params.alpha,
        delta=params.delta,
        epsilon=params.epsilon,
        dtype=dtype,
    )
    planner = Planner(env.A, env.B, env.C, params.q_weight, params.r_weight,
                      params.horizon, params.dt)
    mpc = build_mpc_problem(env.A, env.B, env.C, params.q_weight,
                            params.r_weight, params.horizon,
                            scenario.n_obstacles)
    return PipelineStatics(env, planner, mpc)


@functools.partial(jax.jit,
                   static_argnames=("statics", "n_steps", "n_samples",
                                    "qp_iters"))
def run_scenario_core(statics: PipelineStatics, key,
                      ego_start, ego_goal,
                      obstacle_starts, obstacle_directions, obstacle_speeds,
                      n_steps: int, n_samples: int,
                      noise_var: float, ego_velocity: float,
                      qp_iters: int = 60, qp_tol: float | None = None
                      ) -> ScenarioResult:
    """The full single-scenario pipeline as one jitted program.

    Mirrors reference main.py:19-144: generate obstacles, plan, compute
    halfspaces, filter per metric, evaluate distances.
    """
    env, planner, mpc = statics
    dtype = env.A.dtype

    obstacles = generate_obstacle_scenarios(
        key, obstacle_starts.astype(dtype), obstacle_directions.astype(dtype),
        obstacle_speeds.astype(dtype), n_steps, env.dt, n_samples, noise_var)
    return run_scenario_with_obstacles(statics, obstacles, ego_start,
                                       ego_goal, ego_velocity, qp_iters,
                                       qp_tol)


@functools.partial(jax.jit, static_argnames=("statics", "qp_iters"))
def run_scenario_with_obstacles(statics: PipelineStatics,
                                obstacles: ObstacleData,
                                ego_start, ego_goal, ego_velocity,
                                qp_iters: int = 60,
                                qp_tol: float | None = None
                                ) -> ScenarioResult:
    """Pipeline stages downstream of obstacle generation.

    Takes pre-generated `ObstacleData` so externally produced sample
    streams (e.g. the reference's NumPy MT19937 draws, for golden
    end-to-end parity tests) can be injected."""
    env, planner, mpc = statics
    dtype = env.A.dtype
    H = env.horizon
    obstacles = ObstacleData(*[x.astype(dtype) for x in obstacles])

    x_ref, u_ref, _ = straight_line_trajectory(
        planner, ego_start.astype(dtype), ego_goal.astype(dtype),
        ego_velocity)

    halfspaces = compute_safe_halfspaces_for_trajectory(
        env, obstacles.samples, x_ref)

    # x0: position = ego_start, zero velocity (reference main.py:76-78).
    x0 = jnp.zeros((env.n_states,), dtype).at[:2].set(ego_start.astype(dtype))

    # Stack the three metrics' halfspaces on a leading axis and vmap the
    # MPC solve over it (reference main.py:108-118 loops instead).
    hs_h = jnp.stack([halfspaces.by_metric(m).h for m in METRICS])
    hs_g = jnp.stack([halfspaces.by_metric(m).g_tilde for m in METRICS])
    # Per-scenario sim_time shorter than the MPC horizon (paper
    # presets): later timesteps have no obstacle data, hence no safety
    # constraint -- the reference simply skips those soft-constraint
    # rows (core/mpc_filter.py:119).  The static-shape equivalent is
    # padding with INACTIVE halfspaces (unit normal, g~ = -1e4: an
    # obstacle ~10 km away; slack stays 0, rows never bind).
    n_hs = hs_h.shape[1]
    if n_hs < H:
        pad = H - n_hs
        n_obs = hs_h.shape[2]
        pad_h = jnp.zeros((3, pad, n_obs, 2), dtype).at[..., 0].set(1.0)
        pad_g = jnp.full((3, pad, n_obs), -1e4, dtype)
        hs_h = jnp.concatenate([hs_h, pad_h], axis=1)
        hs_g = jnp.concatenate([hs_g, pad_g], axis=1)

    u_min, u_max = [jnp.asarray(b, dtype) for b in INPUT_BOUNDS]
    # Reference main.py:112 passes state_bounds[:2] == the whole (min4,
    # max4) tuple; mpc_filter trims the 4-vectors to the 2-dim position.
    p_min = jnp.asarray(STATE_BOUNDS[0][:2], dtype)
    p_max = jnp.asarray(STATE_BOUNDS[1][:2], dtype)

    # NOTE (round-5 measurement): warm-starting cvar/dr_cvar from the
    # mean-metric solve (VERDICT r4 next #4a) was implemented and
    # MEASURED NET NEGATIVE here, then reverted: cold solves on these
    # instances already early-exit in 6-9 IPM iterations, so there were
    # no iterations to save, while the metric offsets (delta + eps/alpha
    # apart) put the seed on the wrong active set -- warm dr_cvar lanes
    # took MORE iterations (11 vs 9) and on tail instances accepted
    # points up to 3e-2 off the f64 optimum (vs 1.1e-2 cold input
    # sensitivity).  The `warm=` API in ops/qp_ipm_structured remains
    # for genuinely-near problems (perturbed rhs / receding horizon),
    # where it measurably cuts iterations
    # (tests/test_qp_structured.py::test_warm_start_same_optimum_...).
    def solve_one(h_m, g_m):
        return _filter_core(mpc, x0, x_ref, h_m, g_m,
                            u_min, u_max, p_min, p_max, qp_iters, qp_tol)

    u_opt, slack, sol, objective = jax.vmap(solve_one)(hs_h, hs_g)

    # Fallback on non-convergence: no previous solution in a one-shot run,
    # so replay u_ref (reference core/mpc_filter.py:205-207).
    use_fb = ~sol.converged
    u_final = jnp.where(use_fb[:, None, None], u_ref[None], u_opt)
    x_final = jax.vmap(
        lambda u: simulate_linear_system(x0, u, env.A, env.B, env.C)[0]
    )(u_final)

    distances = jax.vmap(
        lambda x: compute_distance_to_collision(env, x, obstacles.realization)
    )(x_final)
    ref_distance = compute_distance_to_collision(env, x_ref,
                                                 obstacles.realization)

    return ScenarioResult(
        x_ref=x_ref, u_ref=u_ref,
        filtered_x=x_final, filtered_u=u_final, slack=slack,
        qp_converged=sol.converged, used_fallback=use_fb,
        objective=objective,
        qp_iterations=sol.iterations, qp_gap=sol.gap,
        wall_time_ms=jnp.asarray(-1.0, dtype),
        distances=distances, reference_distance=ref_distance,
        halfspaces=halfspaces, obstacles=obstacles,
    )


def run_single_scenario(scenario: Scenario, params: Parameters,
                        key=None, seed: int = 42, dtype=jnp.float32,
                        statics: PipelineStatics | None = None
                        ) -> ScenarioResult:
    """Host-friendly wrapper: build statics, draw a key, run the pipeline.

    Counterpart of reference main.run_single_scenario (main.py:19-186)
    minus plotting (see simulation/visualization.py and cli.py).
    """
    import time

    if key is None:
        key = jax.random.PRNGKey(seed)
    if statics is None:
        statics = make_statics(scenario, params, dtype)
    sim_time = scenario.sim_time if scenario.sim_time is not None \
        else params.sim_time
    n_steps = int(sim_time / params.dt)
    t0 = time.perf_counter()
    result = run_scenario_core(
        statics, key,
        jnp.asarray(scenario.ego_start), jnp.asarray(scenario.ego_goal),
        jnp.asarray(scenario.obstacle_starts),
        jnp.asarray(scenario.obstacle_directions),
        jnp.asarray(scenario.obstacle_speeds),
        n_steps, params.num_samples, params.noise_var, params.ego_velocity)
    # Force a device->host value readback before stopping the clock:
    # through remote tunnels block_until_ready can ack before execution,
    # but a result value cannot arrive early (see bench.py methodology).
    float(result.objective.sum())
    wall_ms = (time.perf_counter() - t0) * 1e3
    return result._replace(wall_time_ms=jnp.asarray(wall_ms, dtype))
