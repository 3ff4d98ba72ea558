"""Pallas TPU kernels for the hot halfspace path.

`fused_drcvar_halfspace` computes, in ONE VMEM pass over the sample
block, everything `DRCVaRSafeHalfspace.create` does per instance
(reference core/halfspaces.py:151-194 + core/risk_metrics.py:84-177):

  mean -> separating vector h -> projections s = h.xi ->
  exact k-th largest of (-s) via radix-select -> tail-mean CVaR ->
  g* = CVaR + r~ - delta + eps/alpha  ->  g~ = g* - r~

The batched XLA closed form (ops/halfspace.py) is already HBM-bound at
~N=1000; this kernel exists to pin the single-pass fusion (one read of
the samples, no intermediate HBM traffic) and as the building block for
the sample-sharded variant.  Falls back to interpret mode off-TPU.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * samples are passed as separate x/y planes [B, N] so blocks are plain
    (TILE_B, N_pad) tiles -- last dim a multiple of 128;
  * the radix select runs entirely in registers/VMEM: 32 fori_loop steps
    of masked counts on the block (VPU reductions), no sort;
  * padding columns are masked via broadcasted_iota >= N.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _drcvar_kernel(sx_ref, sy_ref, ego_ref, out_g_ref, out_h_ref,
                   *, n_samples: int, k: int, alpha: float, delta: float,
                   epsilon: float, r_combined: float):
    """One block: [TILE_B, N_pad] sample planes -> g_tilde, h."""
    sx = sx_ref[:]                      # [bt, n_pad]
    sy = sy_ref[:]
    ego = ego_ref[:]                    # [bt, 2]
    bt, n_pad = sx.shape

    col = jax.lax.broadcasted_iota(jnp.int32, (bt, n_pad), 1)
    mask = col < n_samples
    inv_n = 1.0 / n_samples

    # Mean over real samples.
    mean_x = jnp.sum(jnp.where(mask, sx, 0.0), axis=1, keepdims=True) * inv_n
    mean_y = jnp.sum(jnp.where(mask, sy, 0.0), axis=1, keepdims=True) * inv_n

    # Separating vector ego -> mean with the reference's [1, 0] fallback
    # (reference core/geometry.py:35-53).
    dx = mean_x[:, 0] - ego[:, 0]
    dy = mean_y[:, 0] - ego[:, 1]
    norm = jnp.sqrt(dx * dx + dy * dy)
    degen = norm < _EPS
    hx = jnp.where(degen, 1.0, dx / jnp.where(degen, 1.0, norm))
    hy = jnp.where(degen, 0.0, dy / jnp.where(degen, 1.0, norm))

    # Projections; maximize over x = -s.
    x = -(sx * hx[:, None] + sy * hy[:, None])
    neg_inf = jnp.float32(-jnp.inf)
    x = jnp.where(mask, x, neg_inf)

    # Radix select: k-th largest via bisection on the monotone uint32 map.
    # All select state is kept 2-D ([bt, 1]) -- TPU bitcast needs >= 2D.
    u = pltpu.bitcast(x, jnp.uint32)
    keys = jnp.where(u >> 31 == 1, ~u, u ^ jnp.uint32(0x80000000))

    def body(_, bounds):
        lo, hi = bounds  # [bt, 1]
        mid = lo + (hi - lo) // 2 + (hi - lo) % 2
        count = jnp.sum((keys >= mid).astype(jnp.int32), axis=1,
                        keepdims=True)
        ok = count >= k
        return (jnp.where(ok, mid, lo),
                jnp.where(ok, hi, mid - jnp.uint32(1)))

    lo0 = jnp.zeros((bt, 1), jnp.uint32)
    hi0 = jnp.full((bt, 1), jnp.uint32(0xFFFFFFFF))
    lo, _ = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    kth_u = jnp.where(lo >> 31 == 1, lo ^ jnp.uint32(0x80000000), ~lo)
    v = pltpu.bitcast(kth_u, jnp.float32)[:, 0]

    # Tie-safe tail mean (core/risk.cvar_from_kth).
    an = alpha * n_samples
    gt = x > v[:, None]
    c = jnp.sum(gt.astype(jnp.float32), axis=1)
    tail = jnp.sum(jnp.where(gt, x, jnp.float32(0.0)), axis=1)
    cvar = (tail + (an - c) * v) / an

    # h is unit (or the unit fallback), so r~ = r_combined.
    g_star = cvar + r_combined - delta + epsilon / alpha
    out_g_ref[:] = (g_star - r_combined)[:, None]
    out_h_ref[:] = jnp.stack([hx, hy], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("alpha", "delta", "epsilon",
                                    "robot_radius", "obstacle_radius",
                                    "tile_b", "interpret"))
def fused_drcvar_halfspace(samples, ego_ref_pos, alpha: float, delta: float,
                           epsilon: float, robot_radius: float,
                           obstacle_radius: float, tile_b: int = 16,
                           interpret: bool = False):
    """Fused DR-CVaR halfspaces for a batch of instances.

    Args:
      samples: [B, N, 2] float32 obstacle samples (B % tile_b == 0 is
        handled by padding internally).
      ego_ref_pos: [B, 2] ego reference positions.
    Returns:
      (h [B, 2], g_tilde [B]) exactly matching
      ops/halfspace.dr_cvar_halfspace.
    """
    samples = samples.astype(jnp.float32)
    ego_ref_pos = ego_ref_pos.astype(jnp.float32)
    B, N, _ = samples.shape
    n_pad = _round_up(N, 128)
    b_pad = _round_up(B, tile_b)
    k = max(min(int(math.ceil(alpha * N - 1e-12)), N), 1)
    r_combined = float(robot_radius + obstacle_radius)

    sx = jnp.zeros((b_pad, n_pad), jnp.float32).at[:B, :N].set(
        samples[:, :, 0])
    sy = jnp.zeros((b_pad, n_pad), jnp.float32).at[:B, :N].set(
        samples[:, :, 1])
    ego = jnp.zeros((b_pad, 2), jnp.float32).at[:B].set(ego_ref_pos)

    kernel = functools.partial(
        _drcvar_kernel, n_samples=N, k=k, alpha=alpha, delta=delta,
        epsilon=epsilon, r_combined=r_combined)

    grid = (b_pad // tile_b,)
    out_g, out_h = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 2), jnp.float32),
        ],
        interpret=interpret,
    )(sx, sy, ego)

    return out_h[:B], out_g[:B, 0]
