"""Runnable demo: multi-obstacle scenario, DR-CVaR metric, with
control-input plots.

Counterpart of reference test_scripts/multi_obstacle.py:21-245 (DR-CVaR
only, plus control-input plots at multi_obstacle.py:208-228).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_multi_obstacle_scenario(save_dir: str, seed: int = 42):
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu as dct
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.simulation import (
        visualization as viz)

    params = dct.config.get_parameters()
    scenario = dct.config.get_scenario_config("multi_obstacle")
    print(f"\n=== {scenario.description} ===")

    result = dct.models.run_single_scenario(scenario, params, seed=seed,
                                            dtype=jnp.float32)

    idx = dct.models.METRICS.index("dr_cvar")
    min_dist = float(result.distances[idx].min())
    verdict = "COLLISION" if min_dist < 0 else "Safe"
    print(f"  dr_cvar: min distance {min_dist:+.4f}  [{verdict}]")
    print(f"  QP status: "
          f"{'optimal' if bool(result.qp_converged[idx]) else 'fallback'}")

    os.makedirs(save_dir, exist_ok=True)
    hs = result.halfspaces.dr_cvar
    viz.visualize_trajectory_with_halfspaces(
        np.asarray(result.filtered_x[idx]),
        np.asarray(result.obstacles.realization),
        np.asarray(hs.h), np.asarray(hs.g_tilde),
        params.robot_radius, params.obstacle_radius,
        title="Multi-obstacle scenario with DR-CVaR safe halfspaces",
        save_path=os.path.join(save_dir, "multi_obstacle_halfspaces.png"))

    # Control-input plots (reference multi_obstacle.py:208-228).
    u = np.asarray(result.filtered_u[idx])
    u_ref = np.asarray(result.u_ref)
    fig, axs = plt.subplots(2, 1, figsize=(10, 8), sharex=True)
    for d, name in ((0, "a_x"), (1, "a_y")):
        axs[d].plot(u[:, d], "b-", label=f"filtered {name}")
        axs[d].plot(u_ref[:, d], "k--", label=f"reference {name}")
        axs[d].set_ylabel(name)
        axs[d].grid(True)
        axs[d].legend()
    axs[1].set_xlabel("Time step")
    fig.suptitle("DR-CVaR filtered control inputs")
    fig.savefig(os.path.join(save_dir, "multi_obstacle_inputs.png"),
                dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"  Saved plots to {save_dir}/")
    return min_dist


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_dir", default="results/multi_obstacle")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()
    run_multi_obstacle_scenario(args.save_dir, args.seed)
