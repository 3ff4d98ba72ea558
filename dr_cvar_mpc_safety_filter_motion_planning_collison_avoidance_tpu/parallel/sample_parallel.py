"""Sample-parallel DR-CVaR: shard the N-sample axis over chips.

For very large N (e.g. the 1500-sample end of the timing sweep, or
N >> 1e5 research settings) the Monte-Carlo sample axis itself can be
sharded.  The CVaR tail reduction needs the k-th largest projection --
an order statistic, which we compute with the radix-select bisection of
ops/halfspace.kth_largest_radix_select: every step needs only a COUNT of
samples above a pivot, and counts are `psum`s.  The whole solver thus
runs sample-parallel with 32 scalar psums + 2 masked-sum psums per
halfspace batch, all riding ICI.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def shard_map(f, **kw):
        return _sm(f, **kw)


def _distributed_kth_largest(x_local, k: int, axis_name: str,
                             n_iters: int = 32):
    """k-th largest over the GLOBAL (sharded) last axis.

    Same monotone float32->uint32 bisection as
    ops/halfspace.kth_largest_radix_select, with each count psum-ed over
    `axis_name`.  x_local: [..., N_local]."""
    u = jax.lax.bitcast_convert_type(x_local.astype(jnp.float32), jnp.uint32)
    keys = jnp.where(u >> 31 == 1, ~u, u ^ jnp.uint32(0x80000000))

    def body(_, bounds):
        lo, hi = bounds
        mid = lo + (hi - lo) // 2 + (hi - lo) % 2
        local = jnp.sum(keys >= mid[..., None], axis=-1)
        count = jax.lax.psum(local, axis_name)
        ok = count >= k
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - jnp.uint32(1))

    batch_shape = x_local.shape[:-1]
    lo0 = jnp.zeros(batch_shape, jnp.uint32)
    hi0 = jnp.full(batch_shape, jnp.uint32(0xFFFFFFFF), jnp.uint32)
    # Under shard_map, the loop body's psum makes the carry varying over
    # every manual axis of x_local EXCEPT `axis_name` (counts are
    # psum-synchronized across it); the initial carry must declare the
    # same varying set or tracing rejects the loop (vma mismatch).
    batch_vma = tuple(a for a in getattr(jax.typeof(x_local), "vma", ())
                      if a != axis_name)
    if batch_vma:
        lo0 = jax.lax.pcast(lo0, batch_vma, to="varying")
        hi0 = jax.lax.pcast(hi0, batch_vma, to="varying")
    lo, _ = jax.lax.fori_loop(0, n_iters, body, (lo0, hi0))
    kth_u = jnp.where(lo >> 31 == 1, lo ^ jnp.uint32(0x80000000), ~lo)
    return jax.lax.bitcast_convert_type(kth_u, jnp.float32)


def _distributed_cvar(x_local, alpha: float, n_global: int, axis_name: str):
    """Exact global CVaR_alpha along a sharded last axis (psum form of
    core/risk.cvar_from_kth)."""
    an = alpha * n_global
    k = max(min(int(math.ceil(an - 1e-12)), n_global), 1)
    v = _distributed_kth_largest(x_local, k, axis_name)
    gt = x_local > v[..., None]
    c = jax.lax.psum(jnp.sum(gt, axis=-1).astype(x_local.dtype), axis_name)
    tail = jax.lax.psum(jnp.sum(jnp.where(gt, x_local, 0.0), axis=-1),
                        axis_name)
    return (tail + (an - c) * v) / an


def dr_cvar_g_sample_parallel(mesh: Mesh, samples, h, alpha, delta, epsilon,
                              robot_radius, obstacle_radius,
                              batch_axis_spec=P(None, "samples", None)):
    """DR-CVaR g* with the sample axis sharded over the mesh.

    samples: [B, N, 2] with N sharded over mesh axis 'samples';
    h: [B, 2].  Returns g_star [B].  The batch axis B follows
    `batch_axis_spec[0]`: None (default) replicates instances over the
    'data' axis; 'data' shards them (h and the returned g follow),
    which on a multi-host DCN mesh keeps the sample-axis psums strictly
    intra-host (parallel/distributed.py layout rule).

    The math matches ops/halfspace.dr_cvar_g_star exactly (verified in
    tests/test_parallel.py against the single-device closed form and in
    tests/distributed_worker.py on a real 2-process cluster).
    """
    n_global = samples.shape[1]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(batch_axis_spec, P(batch_axis_spec[0], None)),
        out_specs=P(batch_axis_spec[0]),
    )
    def kernel(samples_local, h_full):
        s_local = jnp.einsum("bnd,bd->bn", samples_local, h_full,
                             precision=jax.lax.Precision.HIGHEST)
        cvar = _distributed_cvar(-s_local, alpha, n_global, "samples")
        r_tilde = (robot_radius + obstacle_radius) * jnp.linalg.norm(
            h_full, axis=-1)
        return cvar + r_tilde - delta + epsilon / alpha

    return kernel(samples, h)
