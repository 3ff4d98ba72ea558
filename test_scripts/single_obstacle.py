"""Runnable demo: single-obstacle scenarios under all three risk metrics.

Counterpart of reference test_scripts/single_obstacle.py:21-208: runs
head_on / overtaking / intersection, filters under mean/CVaR/DR-CVaR,
prints per-metric minimum distance with a COLLISION/Safe verdict
(reference single_obstacle.py:144-148), and saves trajectory + distance
plots.  Unlike the reference (which duplicates the pipeline inline and
does not seed), this drives the library pipeline and takes a --seed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_single_obstacle_scenario(scenario_name: str, save_dir: str,
                                 seed: int = 42):
    import jax.numpy as jnp

    import dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu as dct
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.simulation import (
        visualization as viz)

    params = dct.config.get_parameters()
    scenario = dct.config.get_scenario_config(scenario_name)
    print(f"\n=== {scenario.description} ===")

    result = dct.models.run_single_scenario(scenario, params, seed=seed,
                                            dtype=jnp.float32)

    verdicts = {}
    for i, metric in enumerate(dct.models.METRICS):
        min_dist = float(result.distances[i].min())
        verdict = "COLLISION" if min_dist < 0 else "Safe"
        verdicts[metric] = (min_dist, verdict)
        print(f"  {metric:10s}: min distance {min_dist:+.4f}  [{verdict}]")
    ref_min = float(result.reference_distance.min())
    print(f"  {'reference':10s}: min distance {ref_min:+.4f}  "
          f"[{'COLLISION' if ref_min < 0 else 'Safe'}]")

    os.makedirs(save_dir, exist_ok=True)
    distances = {m: np.asarray(result.distances[i])
                 for i, m in enumerate(dct.models.METRICS)}
    distances["reference"] = np.asarray(result.reference_distance)
    viz.plot_distance_to_collision(
        distances,
        save_path=os.path.join(save_dir, f"{scenario_name}_distances.png"),
        title=f"{scenario_name}: distance to collision")

    for i, metric in enumerate(dct.models.METRICS):
        viz.plot_scenario(
            np.asarray(result.filtered_x[i]),
            np.asarray(result.obstacles.realization),
            params.robot_radius, params.obstacle_radius,
            title=f"{scenario_name} ({metric})",
            save_path=os.path.join(save_dir,
                                   f"{scenario_name}_{metric}_trajectory.png"))
    return verdicts


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_dir", default="results/single_obstacle")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()
    for name in ["head_on", "overtaking", "intersection"]:
        run_single_obstacle_scenario(name, args.save_dir, args.seed)
