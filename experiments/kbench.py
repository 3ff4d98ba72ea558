"""Microbench: where does the fused Pallas halfspace kernel spend time?

Times kernel VARIANTS at the bench shape (batch 32768, N=1000) with the
same chained fori_loop + value-readback methodology as bench.py, to
attribute cost between the select chain, the projection/mean sweeps,
and block-shape effects.  Experiment harness only -- not a test.
"""

from __future__ import annotations

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _select_r3(x, k, alpha, n_samples):
    """Round-3 production select, kept verbatim as an attribution
    baseline: materialized key block, 2 min/max bound sweeps, 3-ary
    early-exit while_loop.  (The production select has since moved to
    float-space compares with moment-seeded bounds; see variant
    'prod'.)"""
    bt, _ = x.shape
    u = pltpu.bitcast(x, jnp.uint32)
    keys = jnp.where(u >> 31 == 1, ~u, u ^ jnp.uint32(0x80000000))
    finite = x > jnp.float32(-jnp.inf)
    skeys = pltpu.bitcast(keys ^ jnp.uint32(0x80000000), jnp.int32)
    smin = jnp.min(jnp.where(finite, skeys, jnp.int32(0x7FFFFFFF)),
                   axis=1, keepdims=True)
    smax = jnp.max(jnp.where(finite, skeys, jnp.int32(-0x80000000)),
                   axis=1, keepdims=True)
    lo0 = pltpu.bitcast(smin, jnp.uint32) ^ jnp.uint32(0x80000000)
    hi0 = pltpu.bitcast(smax, jnp.uint32) ^ jnp.uint32(0x80000000)
    c0 = jnp.full((bt, 1), n_samples, jnp.int32)

    def row_done(lo, hi, c_lo):
        return (c_lo == k) | (lo >= hi)

    def cond(state):
        t, lo, hi, c_lo = state
        return jnp.logical_and(t < 22, ~jnp.all(row_done(lo, hi, c_lo)))

    def body(state):
        t, lo, hi, c_lo = state
        span = hi - lo
        third = span // 3
        m1 = lo + third + jnp.uint32(1)
        m2 = lo + third * 2 + jnp.uint32(1)
        d = ((keys >= m1).astype(jnp.int32)
             + (keys >= m2).astype(jnp.int32) * 2048)
        w = jnp.sum(d, axis=1, keepdims=True, dtype=jnp.int32)
        c1 = w & 2047
        c2 = w >> 11
        ok2 = c2 >= k
        ok1 = c1 >= k
        frozen = row_done(lo, hi, c_lo)
        lo_n = jnp.where(ok2, m2, jnp.where(ok1, m1, lo))
        c_n = jnp.where(ok2, c2, jnp.where(ok1, c1, c_lo))
        hi_n = jnp.where(ok2, hi,
                         jnp.where(ok1, m2 - jnp.uint32(1),
                                   m1 - jnp.uint32(1)))
        return (t + 1,
                jnp.where(frozen, lo, lo_n),
                jnp.where(frozen, hi, hi_n),
                jnp.where(frozen, c_lo, c_n))

    _, lo, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), lo0, hi0, c0))
    v = jnp.min(jnp.where(keys >= lo, x, jnp.float32(jnp.inf)), axis=1)
    an = alpha * n_samples
    gt = x > v[:, None]
    c = jnp.sum(gt.astype(jnp.float32), axis=1)
    tail = jnp.sum(jnp.where(gt, x, jnp.float32(0.0)), axis=1)
    return (tail + (an - c) * v) / an


def _select_none(x, k, alpha, n_samples):
    """Stand-in: masked mean (1 sweep) -- measures everything BUT the
    select."""
    fin = x > jnp.float32(-jnp.inf)
    s = jnp.sum(jnp.where(fin, x, 0.0), axis=1)
    return s / n_samples


def _select_fixed(n_passes):
    def sel(x, k, alpha, n_samples):
        """3-ary bisection with a FIXED fori_loop trip count (no early
        exit, no per-pass cond reduction)."""
        bt, _ = x.shape
        u = pltpu.bitcast(x, jnp.uint32)
        keys = jnp.where(u >> 31 == 1, ~u, u ^ jnp.uint32(0x80000000))
        finite = x > jnp.float32(-jnp.inf)
        skeys = pltpu.bitcast(keys ^ jnp.uint32(0x80000000), jnp.int32)
        smin = jnp.min(jnp.where(finite, skeys, jnp.int32(0x7FFFFFFF)),
                       axis=1, keepdims=True)
        smax = jnp.max(jnp.where(finite, skeys, jnp.int32(-0x80000000)),
                       axis=1, keepdims=True)
        lo0 = pltpu.bitcast(smin, jnp.uint32) ^ jnp.uint32(0x80000000)
        hi0 = pltpu.bitcast(smax, jnp.uint32) ^ jnp.uint32(0x80000000)
        c0 = jnp.full((bt, 1), n_samples, jnp.int32)

        def body(t, state):
            lo, hi, c_lo = state
            span = hi - lo
            third = span // 3
            m1 = lo + third + jnp.uint32(1)
            m2 = lo + third * 2 + jnp.uint32(1)
            d = ((keys >= m1).astype(jnp.int32)
                 + (keys >= m2).astype(jnp.int32) * 2048)
            w = jnp.sum(d, axis=1, keepdims=True, dtype=jnp.int32)
            c1 = w & 2047
            c2 = w >> 11
            ok2 = c2 >= k
            ok1 = c1 >= k
            frozen = (c_lo == k) | (lo >= hi)
            lo_n = jnp.where(ok2, m2, jnp.where(ok1, m1, lo))
            c_n = jnp.where(ok2, c2, jnp.where(ok1, c1, c_lo))
            hi_n = jnp.where(ok2, hi,
                             jnp.where(ok1, m2 - jnp.uint32(1),
                                       m1 - jnp.uint32(1)))
            return (jnp.where(frozen, lo, lo_n),
                    jnp.where(frozen, hi, hi_n),
                    jnp.where(frozen, c_lo, c_n))

        lo, _, _ = jax.lax.fori_loop(0, n_passes, body, (lo0, hi0, c0))
        v = jnp.min(jnp.where(keys >= lo, x, jnp.float32(jnp.inf)), axis=1)
        an = alpha * n_samples
        gt = x > v[:, None]
        c = jnp.sum(gt.astype(jnp.float32), axis=1)
        tail = jnp.sum(jnp.where(gt, x, jnp.float32(0.0)), axis=1)
        return (tail + (an - c) * v) / an
    return sel


def make_kernel(select_fn):
    def _kern(sx_ref, sy_ref, ego_ref, out_g_ref, out_h_ref,
              *, n_samples, k, alpha, delta, epsilon, r_combined):
        sx = sx_ref[:]
        sy = sy_ref[:]
        ego = ego_ref[:]
        bt, n_pad = sx.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (bt, n_pad), 1)
        mask = col < n_samples
        inv_n = jnp.float32(1.0 / n_samples)
        cx = sx - ego[:, 0][:, None]
        cy = sy - ego[:, 1][:, None]
        dx = jnp.sum(jnp.where(mask, cx, 0.0), axis=1) * inv_n
        dy = jnp.sum(jnp.where(mask, cy, 0.0), axis=1) * inv_n
        norm = jnp.sqrt(dx * dx + dy * dy)
        degen = norm < _EPS
        hx = jnp.where(degen, 1.0, dx / jnp.where(degen, 1.0, norm))
        hy = jnp.where(degen, 0.0, dy / jnp.where(degen, 1.0, norm))
        x = -((cx - dx[:, None]) * hx[:, None]
              + (cy - dy[:, None]) * hy[:, None])
        x = jnp.where(mask, x, jnp.float32(-jnp.inf))
        shift = hx * (ego[:, 0] + dx) + hy * (ego[:, 1] + dy)
        cvar = select_fn(x, k, alpha, n_samples) - shift
        g_star = cvar + r_combined - delta + epsilon / alpha
        out_g_ref[:] = (g_star - r_combined)[:, None]
        out_h_ref[:] = jnp.stack([hx, hy], axis=1)
    return _kern


@functools.partial(jax.jit, static_argnames=("variant", "tile_b"))
def fused(samples, ego, variant="current", tile_b=256):
    alpha, delta, epsilon = 0.2, 0.1, 0.15
    r_combined = 0.6
    B, N, _ = samples.shape
    n_pad = _round_up(N, 128)
    b_pad = _round_up(B, tile_b)
    k = max(min(int(math.ceil(alpha * N - 1e-12)), N), 1)
    sx = jnp.zeros((b_pad, n_pad), jnp.float32).at[:B, :N].set(
        samples[:, :, 0])
    sy = jnp.zeros((b_pad, n_pad), jnp.float32).at[:B, :N].set(
        samples[:, :, 1])
    eg = jnp.zeros((b_pad, 2), jnp.float32).at[:B].set(ego)
    if variant == "prod":
        # The CURRENT production kernel (shared pre-select stages +
        # moment-seeded float-compare select, ops/pallas_kernels.py).
        from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops import (
            pallas_kernels as pk)
        h_out, g_out = pk.fused_drcvar_halfspace(
            samples, ego, alpha, delta, epsilon, 0.3, 0.3, tile_b=tile_b)
        return h_out, g_out
    if variant == "prod_nosel":
        # Production pre-select stages with the select replaced by a
        # 1-sweep masked mean: everything BUT the select, new layout.
        from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops import (
            pallas_kernels as pk)

        def _kern_pn(sx_ref, sy_ref, ego_ref, out_g_ref, out_h_ref,
                     *, n_samples, k, alpha, delta, epsilon, r_combined):
            sx = sx_ref[:]
            sy = sy_ref[:]
            ego = ego_ref[:]
            bt, n_pad_l = sx.shape
            col = jax.lax.broadcasted_iota(jnp.int32, (bt, n_pad_l), 1)
            mask = col < n_samples
            _, _, hx, hy, x, sigma, shift = pk._centered_stats(
                sx, sy, ego, mask, n_samples)
            fin = x > jnp.float32(-jnp.inf)
            cvar = (jnp.sum(jnp.where(fin, x, 0.0), axis=1) / n_samples
                    + sigma - shift)
            g_star = cvar + r_combined - delta + epsilon / alpha
            out_g_ref[:] = (g_star - r_combined)[:, None]
            out_h_ref[:] = jnp.stack([hx, hy], axis=1)

        kern = functools.partial(_kern_pn, n_samples=N, k=k, alpha=alpha,
                                 delta=delta, epsilon=epsilon,
                                 r_combined=r_combined)
    elif variant == "minimal":
        # Floor probe: read both planes, ONE row-sum each, emit.
        # Anything above the HBM roofline this measures is VPU/grid
        # overhead headroom; the gap between this and prod_nosel is the
        # cost of the projection/moment passes.
        def _kern_min(sx_ref, sy_ref, ego_ref, out_g_ref, out_h_ref,
                      *, n_samples, k, alpha, delta, epsilon, r_combined):
            sx = sx_ref[:]
            sy = sy_ref[:]
            gx = jnp.sum(sx, axis=1) * jnp.float32(1.0 / n_samples)
            gy = jnp.sum(sy, axis=1) * jnp.float32(1.0 / n_samples)
            out_g_ref[:] = (gx + gy)[:, None]
            out_h_ref[:] = jnp.stack([gx, gy], axis=1)

        kern = functools.partial(_kern_min, n_samples=N, k=k, alpha=alpha,
                                 delta=delta, epsilon=epsilon,
                                 r_combined=r_combined)
    else:
        sel = {"r3": _select_r3, "nosel": _select_none,
               "fixed12": _select_fixed(12), "fixed22": _select_fixed(22),
               }[variant]
        kern = functools.partial(make_kernel(sel), n_samples=N, k=k,
                                 alpha=alpha, delta=delta, epsilon=epsilon,
                                 r_combined=r_combined)
    grid = (b_pad // tile_b,)
    out_g, out_h = pl.pallas_call(
        kern, grid=grid,
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
    )(sx, sy, eg)
    return out_h[:B], out_g[:B, 0]


@functools.partial(jax.jit, static_argnames=("tile_b", "n_samples"))
def minimal_planes(sx, sy, ego, tile_b: int, n_samples: int):
    """The `minimal` floor probe fed PRE-SPLIT padded planes: pure
    kernel HBM-read + 2 row sums, no de-interleave in the program."""
    b_pad, n_pad = sx.shape

    def _kern(sx_ref, sy_ref, ego_ref, out_g_ref, out_h_ref):
        sxv = sx_ref[:]
        syv = sy_ref[:]
        gx = jnp.sum(sxv, axis=1) * jnp.float32(1.0 / n_samples)
        gy = jnp.sum(syv, axis=1) * jnp.float32(1.0 / n_samples)
        out_g_ref[:] = (gx + gy + ego_ref[0, 0])[:, None]
        out_h_ref[:] = jnp.stack([gx, gy], axis=1)

    grid = (b_pad // tile_b,)
    out_g, out_h = pl.pallas_call(
        _kern, grid=grid,
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
    )(sx, sy, jnp.zeros((b_pad, 2), jnp.float32).at[:].set(ego))
    return out_h, out_g[:, 0]


def timed(fn, k_iters=32, repeats=2):
    float(fn(jnp.int32(0)))
    t0 = min(_t(fn, jnp.int32(0)) for _ in range(repeats))
    float(fn(jnp.int32(k_iters)))
    tk = min(_t(fn, jnp.int32(k_iters)) for _ in range(repeats))
    return max(tk - t0, 1e-12) / k_iters


def _t(fn, a):
    t0 = time.perf_counter()
    float(fn(a))
    return time.perf_counter() - t0


def main(variants):
    batch, N = 32768, 1000
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make(key):
        k1, k2 = jax.random.split(key)
        s = (jnp.array([0.5, 0.0], jnp.float32)
             + 0.1 * jax.random.normal(k1, (batch, N, 2), jnp.float32))
        e = 0.1 * jax.random.normal(k2, (batch, 2), jnp.float32)
        return s, e

    samples, ego0 = make(key)
    jax.block_until_ready(samples)

    # Pre-split SoA planes (built once, OUTSIDE the timed loop) for the
    # *_planes variants: isolates the cost of the per-call
    # [B,N,2] -> padded-planes de-interleave from the kernel proper.
    n_pad_g = _round_up(N, 128)

    @jax.jit
    def split(s):
        sx = jnp.zeros((batch, n_pad_g), jnp.float32).at[:, :N].set(
            s[:, :, 0])
        sy = jnp.zeros((batch, n_pad_g), jnp.float32).at[:, :N].set(
            s[:, :, 1])
        return sx, sy

    sx_pre, sy_pre = split(samples)
    jax.block_until_ready(sx_pre)

    for spec in variants:
        name, tile = (spec.split(":") + ["256"])[:2]
        tile = int(tile)

        # Data arrays enter as ARGUMENTS, never closure captures: a
        # closed-over 256 MB device array lowers as an embedded MLIR
        # constant (compiles took ~10 min and hit remote-compile size
        # limits before this was caught).
        @functools.partial(jax.jit, static_argnames=("name", "tile"))
        def loop(kk, data, e0, name, tile):
            def body(i, carry):
                e, acc = carry
                if name == "minimal_planes":
                    h, g = minimal_planes(data[0], data[1], e, tile, N)
                else:
                    h, g = fused(data, e, variant=name, tile_b=tile)
                return e0 + 1e-6 * g[:, None], acc + jnp.sum(g)
            _, acc = jax.lax.fori_loop(0, kk, body,
                                       (e0, jnp.float32(0.0)))
            return acc

        data = ((sx_pre, sy_pre) if name == "minimal_planes"
                else samples)
        t = timed(lambda kk: loop(kk, data, ego0, name, tile))
        print(f"{name}:tile{tile}  {t*1e3:8.3f} ms/iter  "
              f"{batch/t/1e6:7.2f} M solves/s  "
              f"{batch*N*8/t/1e9:6.1f} GB/s implied", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["r3", "nosel", "prod", "prod:512"])


def measure_prod_rounds(batch=32768, N=1000, tile_b=None):
    """Reports the PRODUCTION select's while_loop trip count per block
    (the block retires on its WORST row), to quantify how close the
    moment-seeded 4-ary select runs to the log4 optimum.  Reuses the
    production loop body itself via
    pallas_kernels._select_lo(return_rounds=True) -- no inlined copy to
    desynchronize (ADVICE r4) -- and the production tile picker, so the
    probed block height matches what the kernel actually retires."""
    import numpy as np
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops import (
        pallas_kernels as pk)

    key = jax.random.PRNGKey(0)
    n_pad = _round_up(N, 128)
    if tile_b is None:
        tile_b = pk._pick_tile_b(batch, None, n_pad)
    b_pad = _round_up(batch, tile_b)
    sx = 0.5 + 0.1 * jax.random.normal(key, (b_pad, n_pad), jnp.float32)
    sy = 0.1 * jax.random.normal(jax.random.fold_in(key, 1),
                                 (b_pad, n_pad), jnp.float32)
    alpha = 0.2
    k = max(min(int(math.ceil(alpha * N - 1e-12)), N), 1)

    def kern(sx_ref, sy_ref, ego_ref, out_r_ref):
        sxv = sx_ref[:]
        syv = sy_ref[:]
        ego = ego_ref[:]
        bt, npd = sxv.shape
        colv = jax.lax.broadcasted_iota(jnp.int32, (bt, npd), 1)
        mask = colv < N
        _, _, hx, hy, x, sigma, shift = pk._centered_stats(
            sxv, syv, ego, mask, N)
        _, t = pk._select_lo(x, sigma, k, N, return_rounds=True)
        out_r_ref[:] = jnp.full((bt, 1), 1, jnp.int32) * t

    grid = (b_pad // tile_b,)
    rounds = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
    )(sx, sy, 0.1 * jax.random.normal(key, (b_pad, 2), jnp.float32))
    per_block = np.asarray(rounds).reshape(-1, tile_b)[:, 0]
    print(f"select rounds per {tile_b}-row block (incl. seed round): "
          f"min={per_block.min()} mean={per_block.mean():.2f} "
          f"max={per_block.max()}  (log4 span optimum ~6-7)", flush=True)
