"""Worker: on-chip north-star accuracy assertion (round-3 task 1).

Runs in its OWN process (the suite's conftest forces CPU) against the
real TPU.  Loads reference-RNG seed-42 obstacle streams and the scipy
`trust-constr` oracle controls (both precomputed in float64 by
tests/test_tpu.py::test_tpu_northstar_oracle), runs the PRODUCTION
float32 pipeline -- fused Pallas halfspaces + structured Schur-IPM with
active-set polish -- on the chip, and asserts the BASELINE.md:31-33
contract on hardware:

    max |u_TPU - u_oracle| < 1e-4

for every risk metric on head_on AND multi_obstacle.  Exit 77 = no TPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOUND = 1e-4


def main(npz_path: str) -> int:
    import numpy as np

    import jax

    if jax.default_backend() != "tpu":
        print(f"no TPU (backend={jax.default_backend()}); skipping")
        return 77
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    import jax.numpy as jnp

    import dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu as dct
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.pipeline import (
        METRICS, make_statics, run_scenario_with_obstacles)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.simulation.obstacles import (
        ObstacleData)

    data = np.load(npz_path)
    params = dct.config.get_parameters("custom")
    worst = 0.0
    for name in data["scenarios"]:
        scenario = dct.config.get_scenario_config(str(name))
        obstacles = ObstacleData(
            nominal=jnp.asarray(data[f"{name}_nominal"], jnp.float32),
            samples=jnp.asarray(data[f"{name}_samples"], jnp.float32),
            realization=jnp.asarray(data[f"{name}_realization"],
                                    jnp.float32))
        statics = make_statics(scenario, params, jnp.float32)
        res = run_scenario_with_obstacles(
            statics, obstacles,
            jnp.asarray(scenario.ego_start, jnp.float32),
            jnp.asarray(scenario.ego_goal, jnp.float32),
            params.ego_velocity)
        assert bool(np.asarray(res.qp_converged).all()), \
            f"{name}: QP did not converge on chip"
        for mi, metric in enumerate(METRICS):
            u_oracle = data[f"{name}_{metric}_u_oracle"]
            dev = float(np.max(np.abs(
                np.asarray(res.filtered_u[mi], np.float64) - u_oracle)))
            worst = max(worst, dev)
            print(f"{name}/{metric}: max|u_TPU - u_oracle| = {dev:.3e}",
                  flush=True)
            assert dev < BOUND, (
                f"{name}/{metric}: on-chip deviation {dev:.3e} >= {BOUND}")
    print(f"northstar on chip OK (worst {worst:.3e} < {BOUND})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
