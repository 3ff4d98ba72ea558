"""Sharded batch execution of pipelines and sweeps.

Batches of independent problem instances (Monte-Carlo runs, timing-sweep
cells, scenario fleets) shard over the mesh's `data` axis; inside each
shard the batch vmaps, so every chip runs its slice of the batch as one
fused XLA program.  This replaces the reference's serial Python sweep
loops (reference evaluation/timing_analysis.py:51-124 and the ghost
Monte-Carlo module's run loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Parameters, Scenario
from ..models.pipeline import PipelineStatics, make_statics, run_scenario_core
from .mesh import data_sharding


def run_batch_sharded(mesh: Mesh, statics: PipelineStatics, keys,
                      scenario: Scenario, params: Parameters,
                      n_steps: int, qp_iters: int = 35):
    """Run a batch of scenario pipelines, one per PRNG key, with the
    batch axis sharded over the mesh's data axis.

    Implemented with `shard_map`, not jit+sharded-vmap: each device runs
    its OWN vmapped pipeline including its own IPM `while_loop`.  Under
    plain sharded vmap the loop condition is global, so XLA inserts one
    cross-device pred[] all-reduce PER IPM ITERATION (measured in
    parallel/scaling.py); with shard_map the compiled per-device program
    has ZERO collectives -- instances are truly independent and chip
    throughput multiplies by chip count.

    keys: [B, ...] PRNG keys (B divisible by mesh data size).
    Returns (min_distances [B, 3], reference_min [B], converged [B, 3]).
    """
    ego_start = jnp.asarray(scenario.ego_start)
    ego_goal = jnp.asarray(scenario.ego_goal)
    starts = jnp.asarray(scenario.obstacle_starts)
    dirs = jnp.asarray(scenario.obstacle_directions)
    speeds = jnp.asarray(scenario.obstacle_speeds)

    def one(key):
        res = run_scenario_core(
            statics, key, ego_start, ego_goal, starts, dirs, speeds,
            n_steps, params.num_samples, params.noise_var,
            params.ego_velocity, qp_iters=qp_iters)
        return (res.distances.min(axis=1), res.reference_distance.min(),
                res.qp_converged)

    keys = jax.device_put(keys, data_sharding(mesh, keys.ndim))
    spec_in = P(*(("data",) + (None,) * (keys.ndim - 1)))
    fn = jax.jit(jax.shard_map(
        jax.vmap(one), mesh=mesh, in_specs=spec_in,
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False))
    return fn(keys)


def sharded_halfspace_throughput(mesh: Mesh, samples, h, alpha, delta,
                                 epsilon, robot_radius, obstacle_radius):
    """Batched DR-CVaR halfspace solves with instances sharded over the
    data axis (the multi-chip form of the timing benchmark's hot loop).

    samples: [B, N, 2]; h: [B, 2].  Returns g_star [B].
    """
    from ..ops.halfspace import dr_cvar_g_star

    samples = jax.device_put(samples, data_sharding(mesh, 3))
    h = jax.device_put(h, data_sharding(mesh, 2))

    def solve_local(samples, h):
        g_star, _ = dr_cvar_g_star(samples, h, alpha, delta, epsilon,
                                   robot_radius, obstacle_radius)
        return g_star

    # shard_map: per-device independent solves, zero collectives in the
    # compiled program (see run_batch_sharded docstring).
    solve = jax.jit(jax.shard_map(
        solve_local, mesh=mesh,
        in_specs=(P("data", None, None), P("data", None)),
        out_specs=P("data"), check_vma=False))
    return solve(samples, h)


def make_sharded_timing_solvers(mesh: Mesh, params: Parameters):
    """Mesh-sharded counterparts of
    evaluation.timing_analysis._make_batched_solvers: (dr, cvar) solvers
    with the same `(samples [B, N, 2], h [2]) -> g [B]` signature, the
    instance batch sharded over the mesh's `data` axis (the multi-chip
    route of `main.py --mode timing_analysis --mesh data=N`; same
    shard_map shape as `sharded_halfspace_throughput`).

    The shard_mapped jit is built ONCE per solver (the returned closures
    are reused across the sweep's repeats, so repeats hit the jit
    cache); batches not divisible by the data axis are padded by
    wrapping and stripped after.
    """
    from ..ops.halfspace import cvar_g_star, dr_cvar_g_star

    n_data = mesh.shape["data"]

    def _wrap(local):
        solve = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P("data", None, None), P(None)),
            out_specs=P("data"), check_vma=False))

        def solver(samples, h):
            B = samples.shape[0]
            pad = -B % n_data
            if pad:
                # Wrap-index, not samples[:pad]: pad can EXCEED B for
                # small batches (B=3 on a data=8 mesh needs 5 fill
                # rows), where a plain slice under-fills and the
                # sharded device_put rejects the non-divisible batch.
                fill = samples[jnp.arange(pad) % B]
                samples = jnp.concatenate([samples, fill], axis=0)
            samples = jax.device_put(samples, data_sharding(mesh, 3))
            return solve(samples, h)[:B]

        return solver

    def dr_local(samples, h):
        g_star, _ = dr_cvar_g_star(
            samples, h, params.alpha, params.delta, params.epsilon,
            params.robot_radius, params.obstacle_radius)
        return g_star

    def cv_local(samples, h):
        return cvar_g_star(samples, h, params.alpha, params.delta,
                           params.robot_radius, params.obstacle_radius)

    return _wrap(dr_local), _wrap(cv_local)
