"""Benchmark: DR-CVaR halfspace + MPC throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: DR-CVaR safe-halfspace full-call solves/s at N=1000
samples -- the quantity the reference benchmarks serially at 69.011 ms
per call (14.49 calls/s) with CVXPY+ECOS on the author's CPU
(reference results/Timing_Analysis/timing_comparison.csv row N=1000;
BASELINE.md).

Measurement methodology (designed so the number cannot lie)
-----------------------------------------------------------
This environment reaches the TPU through a tunnel whose
`jax.block_until_ready` acks BEFORE device execution completes, so any
dispatch-and-block timing is a dispatch-rate artifact (round-1 verdict).
Every number here is therefore taken as:

  1. K repetitions run INSIDE one XLA program via `lax.fori_loop`, with
     each iteration's inputs perturbed by the previous iteration's
     outputs (a data dependence: XLA can neither elide, hoist, nor
     reorder the iterations);
  2. the program returns a scalar checksum, and the timer brackets one
     dispatch + one device->host VALUE readback (`float(...)` -- the
     value cannot arrive before execution finishes);
  3. a K=0 control run of the same program measures the RTT/dispatch
     floor, which is subtracted;
  4. a hard sanity gate: the headline working set is sized LARGER THAN
     VMEM (v5e ~128 MB) so its per-iteration sample read MUST stream
     from HBM, and the bench REFUSES to print any number whose implied
     compulsory HBM bandwidth exceeds the chip's peak.

Calibration on this chip (TPU v5 lite, v5e: 819 GB/s HBM peak):
a 256 MB fori_loop-chained stream measures ~614 GB/s (75% of peak,
plausible); the same chain on a 64 MB (VMEM-resident) working set
measures an apparent ~6 TB/s -- which is why the gate only counts
compulsory HBM traffic on >VMEM working sets.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache (same one the TPU worker tests use):
# tunnel-remote TPU compiles run minutes per program, and the bench's
# programs are identical across runs -- a warm cache cuts the bench from
# ~14 min of mostly-compile to ~3 min of mostly-measurement.  Must be
# set before jax is first imported.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

BASELINE_DRCVAR_CALL_S = 0.069011  # s per call, reference CSV N=1000
BASELINE_SOLVES_PER_S = 1.0 / BASELINE_DRCVAR_CALL_S

# HBM peak by device kind; conservative default for unknown devices.
HBM_PEAK_GBPS = {
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5e": 819.0,
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6e": 1640.0,
    "cpu": 200.0,
}
VMEM_BYTES = 128 * 1024 * 1024  # v5e-class VMEM capacity


def _hbm_peak_gbps():
    import jax
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", d.platform)
    for k, v in HBM_PEAK_GBPS.items():
        if k.lower() in str(kind).lower() or str(kind).lower() in k.lower():
            return v, str(kind)
    return 819.0, str(kind)


def _timed_value(fn, *args, repeats=3):
    """min over repeats of [dispatch fn(*args) -> float(scalar) readback]."""
    float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, v


def _loop_time(loop_fn, k: int, repeats=3):
    """Per-iteration seconds of an in-program K-loop, RTT-subtracted.

    loop_fn(k) must run k data-dependence-chained iterations inside one
    jitted program and return a scalar checksum.
    """
    import jax
    t0, _ = _timed_value(loop_fn, jax.numpy.int32(0), repeats=repeats)
    tk, v = _timed_value(loop_fn, jax.numpy.int32(k), repeats=repeats)
    per_iter = max(tk - t0, 1e-12) / k
    return per_iter, t0, v


def _gate_bandwidth(name, compulsory_bytes_per_iter, per_iter_s,
                    working_set_bytes, peak_gbps):
    """Refuse numbers whose compulsory HBM bandwidth beats the chip.

    Only a hard physical bound when the working set cannot be cached in
    VMEM across iterations; below that the gate records the implied
    figure but cannot falsify it.
    """
    implied = compulsory_bytes_per_iter / per_iter_s / 1e9
    hard = working_set_bytes > VMEM_BYTES
    if hard and implied > peak_gbps * 1.05:
        print(json.dumps({
            "metric": "MEASUREMENT_REJECTED",
            "bench": name,
            "implied_hbm_gbps": round(implied, 1),
            "peak_hbm_gbps": peak_gbps,
            "reason": "implied compulsory HBM bandwidth exceeds chip peak;"
                      " timing did not capture device execution",
        }))
        sys.exit(1)
    return implied, hard


def bench_halfspace(n_samples=1000, batch=32768, k_iters=64, seed=0):
    """Batched DR-CVaR + CVaR halfspace full calls (mean -> h -> project
    -> CVaR tail -> g), matching DRCVaRSafeHalfspace.create semantics.

    batch=32768 makes the sample tensor 256 MB (> VMEM), so every loop
    iteration must re-stream it from HBM and the bandwidth gate is a
    hard physical bound.
    """
    import jax
    import jax.numpy as jnp

    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.config import (
        get_parameters)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.halfspace import (
        cvar_halfspace, dr_cvar_halfspace)

    p = get_parameters()
    peak_gbps, device_kind = _hbm_peak_gbps()

    # Build data ON DEVICE (tunnel host->device transfers are slow).
    @jax.jit
    def make_data(key):
        k1, k2 = jax.random.split(key)
        samples = (jnp.array([0.5, 0.0], jnp.float32)
                   + 0.1 * jax.random.normal(k1, (batch, n_samples, 2),
                                             jnp.float32))
        ego0 = 0.1 * jax.random.normal(k2, (batch, 2), jnp.float32)
        return samples, ego0

    samples, ego0 = make_data(jax.random.PRNGKey(seed))
    jax.block_until_ready((samples, ego0))

    def make_loop(solver):
        # Data enters as jit ARGUMENTS: a closed-over 256 MB device
        # array lowers as an embedded MLIR constant (minutes of compile
        # time through the remote-compile tunnel).
        @jax.jit
        def loop(k, s, e0):
            def body(i, carry):
                ego, acc = carry
                hs = solver(s, ego)
                g = hs.g_tilde
                acc = acc + jnp.sum(g)
                # Data dependence: next iteration's ego depends on this
                # iteration's solution (bounded 1e-6-scale drift).
                ego = e0 + 1e-6 * g[:, None]
                return ego, acc
            _, acc = jax.lax.fori_loop(
                0, k, body, (e0, jnp.float32(0.0)))
            return acc
        return lambda k: loop(k, samples, ego0)

    def dr_solver(s, e):
        return dr_cvar_halfspace(s, e, p.alpha, p.delta, p.epsilon,
                                 p.robot_radius, p.obstacle_radius)

    def cv_solver(s, e):
        return cvar_halfspace(s, e, p.alpha, p.delta,
                              p.robot_radius, p.obstacle_radius)

    sample_bytes = batch * n_samples * 2 * 4
    out = {}

    t_dr, rtt, _ = _loop_time(make_loop(dr_solver), k_iters)
    bw_dr, hard = _gate_bandwidth("drcvar_xla", sample_bytes, t_dr,
                                  sample_bytes, peak_gbps)
    out["drcvar_xla_solves_per_s"] = batch / t_dr
    out["drcvar_xla_implied_hbm_gbps"] = bw_dr

    t_cv, _, _ = _loop_time(make_loop(cv_solver), k_iters)
    _gate_bandwidth("cvar_xla", sample_bytes, t_cv, sample_bytes, peak_gbps)
    out["cvar_solves_per_s"] = batch / t_cv

    # Pallas fused single-pass kernel: the production TPU path
    # (simulation/environment.py routes to it on TPU).  Off-TPU the
    # kernel never runs: the pallas keys are OMITTED rather than
    # aliased to the XLA number.
    t_pl = None
    if jax.devices()[0].platform != "cpu":
        from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.pallas_kernels import (
            fused_drcvar_halfspace, fused_drcvar_halfspace_planes)
        from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.halfspace import (
            Halfspace)

        # Planes-native path (the production batch layout -- the
        # environment feeds the kernel SoA planes directly,
        # simulation/environment.py): samples as coordinate planes,
        # zero-padded, split ONCE outside the timed loop via the
        # production _split_planes helper.  The AoS wrapper's per-call
        # [B,N,2] de-interleave is a full extra HBM round-trip costing
        # 4x the kernel itself (kbench); both numbers are reported.
        from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.pallas_kernels import (
            _split_planes)

        sx_p, sy_p, ego_pp, _, _ = jax.jit(
            lambda s, e: _split_planes(s, e, 256))(samples, ego0)
        jax.block_until_ready(sx_p)

        @jax.jit
        def planes_loop(k, sx, sy, e0):
            def body(i, carry):
                ego, acc = carry
                h, g = fused_drcvar_halfspace_planes(
                    sx, sy, ego, n_samples, p.alpha, p.delta, p.epsilon,
                    p.robot_radius, p.obstacle_radius)
                acc = acc + jnp.sum(g)
                return e0 + 1e-6 * g[:, None], acc
            _, acc = jax.lax.fori_loop(0, k, body, (e0, jnp.float32(0.0)))
            return acc

        # ego must carry the PADDED batch (b_pad rows) to match the
        # planes: feeding the unpadded ego0 only type-checked because
        # batch happened to be a tile multiple (ADVICE r4).
        t_pl, _, _ = _loop_time(
            lambda k: planes_loop(k, sx_p, sy_p, ego_pp), k_iters)
        bw_pl, _ = _gate_bandwidth("drcvar_pallas", sample_bytes, t_pl,
                                   sample_bytes, peak_gbps)
        out["drcvar_pallas_implied_hbm_gbps"] = bw_pl
        out["drcvar_pallas_solves_per_s"] = batch / t_pl

        def pl_solver(s, e):
            h, g = fused_drcvar_halfspace(
                s, e, p.alpha, p.delta, p.epsilon,
                p.robot_radius, p.obstacle_radius)
            return Halfspace(h, g)

        t_aos, _, _ = _loop_time(make_loop(pl_solver), k_iters)
        out["drcvar_pallas_aos_solves_per_s"] = batch / t_aos

        # --- N=4096: above the old 2047 packed-count cap (round-5 task
        # 3: the kernel's count fields now widen with N, so the 5.6x
        # cliff onto the XLA closed form is gone; both paths measured).
        n_big, b_big = 4096, 8192
        big_bytes = b_big * n_big * 2 * 4  # 256 MB > VMEM: hard gate

        @jax.jit
        def make_big(key):
            k1, k2 = jax.random.split(key)
            s = (jnp.array([0.5, 0.0], jnp.float32)
                 + 0.1 * jax.random.normal(k1, (b_big, n_big, 2),
                                           jnp.float32))
            e = 0.1 * jax.random.normal(k2, (b_big, 2), jnp.float32)
            return s, e

        samples_b, ego_b = make_big(jax.random.PRNGKey(seed + 1))
        sxb, syb, egob, _, _ = jax.jit(
            lambda s, e: _split_planes(s, e, 128))(samples_b, ego_b)
        jax.block_until_ready(sxb)

        @jax.jit
        def planes_loop_big(k, sx, sy, e0):
            def body(i, carry):
                ego, acc = carry
                h, g = fused_drcvar_halfspace_planes(
                    sx, sy, ego, n_big, p.alpha, p.delta, p.epsilon,
                    p.robot_radius, p.obstacle_radius)
                return e0 + 1e-6 * g[:, None], acc + jnp.sum(g)
            _, acc = jax.lax.fori_loop(0, k, body, (e0, jnp.float32(0.0)))
            return acc

        t_pb, _, _ = _loop_time(
            lambda k: planes_loop_big(k, sxb, syb, egob), 16)
        _gate_bandwidth("drcvar_pallas_n4096", big_bytes, t_pb,
                        big_bytes, peak_gbps)
        out["drcvar_pallas_n4096_solves_per_s"] = b_big / t_pb

        @jax.jit
        def xla_loop_big(k, s, e0):
            def body(i, carry):
                ego, acc = carry
                hs = dr_solver(s, ego)
                return (e0 + 1e-6 * hs.g_tilde[:, None],
                        acc + jnp.sum(hs.g_tilde))
            _, acc = jax.lax.fori_loop(0, k, body, (e0, jnp.float32(0.0)))
            return acc

        t_xb, _, _ = _loop_time(
            lambda k: xla_loop_big(k, samples_b, ego_b), 16)
        _gate_bandwidth("drcvar_xla_n4096", big_bytes, t_xb,
                        big_bytes, peak_gbps)
        out["drcvar_xla_n4096_solves_per_s"] = b_big / t_xb
        del samples_b, ego_b, sxb, syb, egob
    out["drcvar_solves_per_s"] = batch / (t_dr if t_pl is None
                                          else min(t_dr, t_pl))

    # Batch-1 chained latency: the real-time-control number (per-solve
    # device latency, RTT excluded; K chained solves in one program).
    # The XLA number grew 6.5 -> ~31 us in round 3 from the accuracy
    # hardening (HIGHEST-precision einsums + doubly-centered
    # reductions); the Pallas kernel at batch 1 (8-row tile) is now the
    # low-latency path and is reported alongside.
    s1, e1 = samples[:1], ego0[:1]

    @jax.jit
    def lat_loop(k, s1, e1):
        def body(i, carry):
            ego, acc = carry
            hs = dr_solver(s1, ego)
            acc = acc + jnp.sum(hs.g_tilde)
            return e1 + 1e-6 * hs.g_tilde[:, None], acc
        _, acc = jax.lax.fori_loop(0, k, body, (e1, jnp.float32(0.0)))
        return acc

    t_lat, _, _ = _loop_time(lambda k: lat_loop(k, s1, e1), 512)
    out["drcvar_batch1_latency_us"] = t_lat * 1e6

    if jax.devices()[0].platform != "cpu":
        n_pad1 = ((n_samples + 127) // 128) * 128
        sx1 = jnp.zeros((8, n_pad1), jnp.float32).at[:1, :n_samples].set(
            samples[0, :, 0])
        sy1 = jnp.zeros((8, n_pad1), jnp.float32).at[:1, :n_samples].set(
            samples[0, :, 1])
        e8 = jnp.broadcast_to(ego0[:1], (8, 2))

        @jax.jit
        def pl_lat_loop(k, sx1, sy1, e8):
            def body(i, carry):
                ego, acc = carry
                h, g = fused_drcvar_halfspace_planes(
                    sx1, sy1, ego, n_samples, p.alpha, p.delta,
                    p.epsilon, p.robot_radius, p.obstacle_radius,
                    tile_b=8)
                return e8 + 1e-6 * g[:, None], acc + jnp.sum(g)
            _, acc = jax.lax.fori_loop(0, k, body,
                                       (e8, jnp.float32(0.0)))
            return acc

        # 8192 chained solves: at ~5 us each the K-delta (~40 ms) must
        # clear the ~25 ms tunnel-RTT jitter or the subtraction returns
        # noise (a K=512 run measured 0.0).
        t_pl_lat, _, _ = _loop_time(
            lambda k: pl_lat_loop(k, sx1, sy1, e8), 8192)
        out["drcvar_pallas_batch1_latency_us"] = t_pl_lat * 1e6
    out["rtt_floor_ms"] = rtt * 1e3
    out["device_kind"] = device_kind
    out["halfspace_batch"] = batch
    out["halfspace_k_iters"] = k_iters
    # Self-consistency: full-batch iteration must cost more than batch-1.
    if t_dr <= t_lat:
        print(json.dumps({"metric": "MEASUREMENT_REJECTED",
                          "bench": "halfspace_selfcheck",
                          "reason": "batch-32768 per-iter time <= batch-1"}))
        sys.exit(1)
    return out


# Conservative per-ITERATION / per-POLISH FLOP floors for the
# structured MPC QP (structured-G Schur assembly ~1.1 MFLOP + 60^3/3
# Cholesky + solves/matvecs ~ 1.2 MFLOP per Mehrotra iteration; the
# gathered active-set polish ~4 MFLOP).  The per-QP floor is DERIVED
# from the measured mean iteration count of the benched batch: rounds
# 1-4 assumed the solver always ran max_iters=35 (100 MFLOP/QP), but
# the early exit actually retires the bench distribution in ~7-11
# iterations, which inflated the reported "MFU floor" ~5x.  Honest
# floor = measured iterations x per-iteration FLOPs.
MPC_FLOP_PER_ITER = 1.2e6
MPC_FLOP_POLISH = 4e6
F32_PEAK_TFLOPS = {
    "TPU v5 lite": 49.0,   # v5e: 197 bf16 TOPS / 4
    "TPU v5e": 49.0,
    "TPU v4": 68.0,
    "TPU v5p": 114.5,
    "TPU v6e": 91.0,
}


def bench_mpc(batches=(512, 2048, 8192), k_iters=8, seed=0, n_obs=3):
    """Batched MPC interior-point solves at the reference stress shape:
    H=30, n_obs=3 (multi_obstacle -- 90 soft halfspace rows + boxes),
    swept over batch sizes to find the throughput knee (round-3 task 4).

    Compute-bound (60x60 Cholesky chains), so no hard bandwidth gate;
    honesty comes from the in-program chained loop + value readback, a
    conservative FLOP floor, and self-consistency with batch 1.
    """
    import jax
    import jax.numpy as jnp

    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.config import (
        get_parameters)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.core.dynamics import (
        create_double_integrator_matrices)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.mpc_filter import (
        build_mpc_problem, filter_core_batched)

    p = get_parameters()
    A, B, C = create_double_integrator_matrices(p.dt, dtype=jnp.float32)
    prob = build_mpc_problem(A, B, C, p.q_weight, p.r_weight, p.horizon,
                             n_obs)
    H = p.horizon
    _, device_kind = _hbm_peak_gbps()
    peak_tflops = next((v for k, v in F32_PEAK_TFLOPS.items()
                        if k.lower() in device_kind.lower()), 49.0)

    max_batch = max(batches)

    @jax.jit
    def make_data(key):
        ks = jax.random.split(key, 4)
        x0 = 0.1 * jax.random.normal(ks[0], (max_batch, 4), jnp.float32)
        x_ref = jnp.cumsum(
            0.2 * jax.random.normal(ks[1], (max_batch, H + 1, 4),
                                    jnp.float32), axis=1)
        hs_h = jax.random.normal(ks[2], (max_batch, H, n_obs, 2),
                                 jnp.float32)
        hs_h = hs_h / jnp.linalg.norm(hs_h, axis=-1, keepdims=True)
        hs_g = jax.random.uniform(ks[3], (max_batch, H, n_obs), jnp.float32,
                                  -1.5, 0.2)
        return x0, x_ref, hs_h, hs_g

    x0_0, x_ref, hs_h, hs_g = make_data(jax.random.PRNGKey(seed))
    jax.block_until_ready(x0_0)

    # Measured iteration count of this exact batch (untimed): the FLOP
    # floor and MFU are derived from it, not from max_iters.
    probe = filter_core_batched(
        prob, x0_0[:2048], x_ref[:2048], hs_h[:2048], hs_g[:2048],
        jnp.asarray([-5.0, -5.0], jnp.float32),
        jnp.asarray([5.0, 5.0], jnp.float32),
        jnp.asarray([-10.0, -10.0], jnp.float32),
        jnp.asarray([10.0, 10.0], jnp.float32), 35, 3e-5)[2]
    mean_iters = float(np.mean(np.asarray(probe.iterations)))
    flop_per_qp = mean_iters * MPC_FLOP_PER_ITER + MPC_FLOP_POLISH

    u_min = jnp.asarray([-5.0, -5.0], jnp.float32)
    u_max = -u_min
    p_min = jnp.asarray([-10.0, -10.0], jnp.float32)
    p_max = -p_min

    def solve(x0, x_ref, hs_h, hs_g):
        # Chunked batching: each 512-chunk gets its own IPM while_loop,
        # so large batches don't idle behind global stragglers
        # (VERDICT r3 weak #4; see filter_core_batched).
        u, _, _, obj = filter_core_batched(prob, x0, x_ref, hs_h, hs_g,
                                           u_min, u_max, p_min, p_max,
                                           35, 3e-5)
        return u, obj

    @jax.jit
    def _mpc_loop(k, x0_init, xr, hh, hg):
        def body(i, carry):
            x0, acc = carry
            u, obj = solve(x0, xr, hh, hg)
            acc = acc + jnp.sum(obj)
            # next x0 depends on this iteration's solution
            x0 = x0_init + 1e-6 * u[:, 0, :].mean(-1, keepdims=True)
            return x0, acc
        _, acc = jax.lax.fori_loop(
            0, k, body, (x0_init, jnp.float32(0.0)))
        return acc

    def make_loop(x0_init, xr, hh, hg):
        # Problem data as jit arguments, not closure constants (see
        # bench_halfspace.make_loop).
        return lambda k: _mpc_loop(k, x0_init, xr, hh, hg)

    sweep = {}
    best_rate, best_batch = 0.0, batches[0]
    for batch in batches:
        # Fewer chained iterations at the largest batches: constant
        # total work, per-iteration time grows with batch.  Floor of 4:
        # at k=2 a few ms of tunnel jitter on the K=0 baseline skews
        # per-iter time ~15% (a 121k QP/s outlier was observed).
        k = max(4, int(round(k_iters * batches[0] / batch)))
        t, _, _ = _loop_time(
            make_loop(x0_0[:batch], x_ref[:batch], hs_h[:batch],
                      hs_g[:batch]), k)
        per_qp = t / batch
        # FLOP-floor gate at f32 peak, from the MEASURED mean iteration
        # count (see MPC_FLOP_PER_ITER note).
        if per_qp < flop_per_qp / (peak_tflops * 1e12):
            print(json.dumps({"metric": "MEASUREMENT_REJECTED",
                              "bench": "mpc",
                              "reason": f"{per_qp*1e6:.2f} us/QP beats the "
                                        "FLOP floor at f32 peak"}))
            sys.exit(1)
        rate = batch / t
        sweep[batch] = round(rate, 1)
        if rate > best_rate:
            best_rate, best_batch = rate, batch

    t1, _, _ = _loop_time(
        make_loop(x0_0[:1], x_ref[:1], hs_h[:1], hs_g[:1]), 64)
    mfu = best_rate * flop_per_qp / (peak_tflops * 1e12)
    return {"mpc_qp_solves_per_s": best_rate,
            "mpc_qp_best_batch": best_batch,
            "mpc_qp_batch_sweep": sweep,
            "mpc_qp_mfu_floor_pct": round(100.0 * mfu, 2),
            "mpc_qp_mean_ipm_iters": round(mean_iters, 1),
            "mpc_qp_n_obs": n_obs,
            "mpc_qp_batch1_latency_ms": t1 * 1e3}


def bench_pipeline(batch=256, n_samples=1000, k_iters=4, seed=0,
                   preset="custom"):
    """Full DR-CVaR scenario pipelines per second (multi-obstacle,
    N=1000 samples/obstacle: generation + planning + halfspaces under
    all 3 metrics + 3 vmapped MPC solves + distances).

    Run for both parameter presets (custom + paper) so the headline
    pipeline number covers the reference's two published configurations.
    """
    import jax
    import jax.numpy as jnp

    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.config import (
        get_parameters, get_scenario_config)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.pipeline import (
        make_statics, run_scenario_core)

    import dataclasses

    base = get_parameters(preset)
    params = dataclasses.replace(base, num_samples=n_samples, sim_time=6.0)
    scenario = get_scenario_config("multi_obstacle", preset=preset)
    statics = make_statics(scenario, params, jnp.float32)
    n_steps = int(params.sim_time / params.dt)

    ego_start = jnp.asarray(scenario.ego_start, jnp.float32)
    ego_goal = jnp.asarray(scenario.ego_goal, jnp.float32)
    starts = jnp.asarray(scenario.obstacle_starts, jnp.float32)
    dirs = jnp.asarray(scenario.obstacle_directions, jnp.float32)
    speeds = jnp.asarray(scenario.obstacle_speeds, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)

    def one(key, ego_s):
        res = run_scenario_core(
            statics, key, ego_s, ego_goal, starts, dirs, speeds,
            n_steps, n_samples, params.noise_var, params.ego_velocity,
            qp_iters=35, qp_tol=3e-5)
        return res.distances.min(), res.filtered_u.sum()

    @jax.jit
    def loop(k):
        def body(i, carry):
            ego_b, acc = carry
            # fold the iteration index into the keys so obstacle
            # generation is not loop-invariant (cannot be hoisted)
            ks = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
            dmin, usum = jax.vmap(one)(ks, ego_b)
            acc = acc + jnp.sum(dmin) + jnp.sum(usum)
            # data dependence across iterations
            ego_b = ego_start[None] + 1e-6 * dmin[:, None]
            return ego_b, acc
        ego_b0 = jnp.broadcast_to(ego_start, (batch, 2))
        _, acc = jax.lax.fori_loop(0, k, body,
                                   (ego_b0, jnp.float32(0.0)))
        return acc

    t, _, _ = _loop_time(loop, k_iters, repeats=3)
    key = ("pipeline_scenarios_per_s" if preset == "custom"
           else f"pipeline_{preset}_scenarios_per_s")
    out = {key: batch / t}

    if preset == "custom":
        # Composed single-scenario latency (the paper's real-time-filter
        # use case, VERDICT r4 next #8): one full pipeline at batch 1,
        # chained-loop methodology as everywhere else.  256 chained
        # pipelines (~0.5 s) clear the tunnel-RTT jitter.
        @jax.jit
        def lat_loop(k):
            def body(i, carry):
                ego, acc = carry
                kk = jax.random.fold_in(jax.random.PRNGKey(seed), i)
                dmin, usum = one(kk, ego)
                return ego_start + 1e-6 * dmin, acc + dmin + usum
            _, acc = jax.lax.fori_loop(
                0, k, body, (ego_start, jnp.float32(0.0)))
            return acc

        t1, _, _ = _loop_time(lat_loop, 256, repeats=3)
        out["pipeline_batch1_latency_ms"] = t1 * 1e3
    return out


def bench_mc(n_runs=300, k_iters=4, seed=0):
    """Monte-Carlo evaluation throughput: full MC runs per second
    (reference ghost module contract, SURVEY.md component 18 -- 300
    serial pipeline re-runs there; one vmapped program here).

    Same shape the CLI's `--mode monte_carlo --mc_runs 300` executes:
    head_on scenario, custom preset (N=20 samples, sim_time 30 s)."""
    import jax
    import jax.numpy as jnp

    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.config import (
        get_parameters, get_scenario_config)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.evaluation.monte_carlo import (
        _mc_core)
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.pipeline import (
        make_statics)

    params = get_parameters("custom")
    scenario = get_scenario_config("head_on")
    statics = make_statics(scenario, params, jnp.float32)
    n_steps = int(params.sim_time / params.dt)
    args = (jnp.asarray(scenario.ego_start), jnp.asarray(scenario.ego_goal),
            jnp.asarray(scenario.obstacle_starts),
            jnp.asarray(scenario.obstacle_directions),
            jnp.asarray(scenario.obstacle_speeds))

    @jax.jit
    def loop(k):
        def body(i, acc):
            key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
            min_d, conv = _mc_core(
                statics, key, *args, n_runs, n_steps, params.num_samples,
                params.noise_var, params.ego_velocity)
            return acc + jnp.sum(min_d) + jnp.sum(conv)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t, _, _ = _loop_time(loop, k_iters, repeats=3)
    return {"mc_runs_per_s": n_runs / t, "mc_n_runs": n_runs}


def _northstar_block(results):
    """BASELINE.md:31-33 contract: >= 10,000 DR-CVaR MPC solves/s on a
    v5e-16 at N=1000 samples/obstacle, max control deviation < 1e-4.

    Only one chip is reachable here, so the 16-chip figure is a
    PROJECTION: measured single-chip throughput x 16, justified by the
    collective census in SCALING.json (the data-sharded solver programs
    compile to ZERO cross-device collectives -- per-chip work is
    independent, so scaling is linear up to input/result DMA, which the
    pipeline amortizes).  The accuracy half of the contract is asserted
    on hardware by tests/test_tpu.py::test_tpu_northstar_oracle.
    """
    import os

    per_chip = results["mpc_qp_solves_per_s"]
    census = None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SCALING.json")
    if os.path.exists(path):
        with open(path) as f:
            s = json.load(f)
        census = {
            "halfspace_collectives": s["halfspace_data_sharded"]["total"],
            "mpc_collectives": s["mpc_data_sharded"]["total"],
        }
    # Numeric-only block (the projection-basis / accuracy-bound prose
    # lives in BENCH_NOTES.md so the driver's 2000-char tail capture
    # keeps every number, VERDICT r4 weak #2).
    out = {
        "target_solves_per_s_v5e16": 10000,
        "measured_single_chip_mpc_solves_per_s": round(per_chip, 1),
        "projected_v5e16_solves_per_s": round(per_chip * 16, 1),
        "projection_margin_x": round(per_chip * 16 / 10000, 1),
    }
    if census is not None:
        out["collective_census"] = census
    return out


def main():
    results = {}
    results.update(bench_halfspace())
    results.update(bench_mpc())
    results.update(bench_pipeline(preset="custom"))
    results.update(bench_pipeline(preset="paper"))
    results.update(bench_mc())

    value = results["drcvar_solves_per_s"]
    # Methodology / attribution prose lives in BENCH_NOTES.md and is
    # printed as its own line BEFORE the result: the driver archives
    # only the LAST 2000 characters of bench output, and in round 4 the
    # trailing prose evicted the headline numbers from the committed
    # BENCH_r04.json (VERDICT r4 weak #2).  The FINAL line is compact
    # all-numeric JSON, asserted under the cap.
    print(json.dumps({
        "metric": "bench_context",
        "notes": "see BENCH_NOTES.md (methodology, layout/headroom "
                 "attribution, northstar projection basis)",
        "methodology": "in-program lax.fori_loop K-chained iterations, "
                       "value-readback timing, K=0 RTT subtracted, "
                       "HBM-bandwidth gate on >VMEM working set",
    }))
    out = {
        "metric": "drcvar_halfspace_solves_per_s_n1000",
        "value": round(value, 2),
        "unit": "solves/s",
        "vs_baseline": round(value / BASELINE_SOLVES_PER_S, 2),
        "baseline_solves_per_s": round(BASELINE_SOLVES_PER_S, 2),
        "device_kind": results["device_kind"],
        "halfspace_batch": results["halfspace_batch"],
        "rtt_floor_ms": round(results["rtt_floor_ms"], 3),
        "drcvar_xla_solves_per_s": round(
            results["drcvar_xla_solves_per_s"], 2),
        "drcvar_xla_implied_hbm_gbps": round(
            results["drcvar_xla_implied_hbm_gbps"], 1),
        "cvar_solves_per_s": round(results["cvar_solves_per_s"], 2),
        "drcvar_batch1_latency_us": round(
            results["drcvar_batch1_latency_us"], 2),
        "mpc_qp_solves_per_s": round(results["mpc_qp_solves_per_s"], 2),
        "mpc_qp_best_batch": results["mpc_qp_best_batch"],
        "mpc_qp_batch_sweep": results["mpc_qp_batch_sweep"],
        "mpc_qp_mfu_floor_pct": results["mpc_qp_mfu_floor_pct"],
        "mpc_qp_mean_ipm_iters": results["mpc_qp_mean_ipm_iters"],
        "mpc_qp_n_obs": results["mpc_qp_n_obs"],
        "mpc_qp_batch1_latency_ms": round(
            results["mpc_qp_batch1_latency_ms"], 3),
        "pipeline_scenarios_per_s": round(
            results["pipeline_scenarios_per_s"], 2),
        "pipeline_paper_scenarios_per_s": round(
            results["pipeline_paper_scenarios_per_s"], 2),
        "pipeline_batch1_latency_ms": round(
            results["pipeline_batch1_latency_ms"], 3),
        "mc_runs_per_s": round(results["mc_runs_per_s"], 2),
        "mc_n_runs": results["mc_n_runs"],
        "northstar": _northstar_block(results),
    }
    # Off-TPU the Pallas kernel never runs; omit its keys rather than
    # alias the XLA number under the Pallas label.
    for k in ("drcvar_pallas_solves_per_s",
              "drcvar_pallas_implied_hbm_gbps",
              "drcvar_pallas_aos_solves_per_s",
              "drcvar_pallas_batch1_latency_us",
              "drcvar_pallas_n4096_solves_per_s",
              "drcvar_xla_n4096_solves_per_s"):
        if k in results:
            out[k] = round(results[k], 2)
    line = json.dumps(out)
    # Hard self-check: the record must survive the driver's tail cap.
    assert len(line) <= 1900, (len(line), "final bench line too long")
    print(line)


if __name__ == "__main__":
    main()
