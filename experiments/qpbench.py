"""Microbench: structured MPC IPM linsolve variants at bench shapes.

Compares the per-iteration Newton-system strategies of
ops/qp_ipm_structured.solve_mpc_qp under vmap on the real chip, with the
same chained-loop + value-readback methodology as bench.py.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.config import (
    get_parameters)
from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.core.dynamics import (
    create_double_integrator_matrices)
from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.mpc_filter import (
    build_mpc_problem)
from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.qp_ipm_structured import (
    solve_mpc_qp)

N_OBS = 3


def make_data(batch, seed=0):
    p = get_parameters()
    A, B, C = create_double_integrator_matrices(p.dt, dtype=jnp.float32)
    prob = build_mpc_problem(A, B, C, p.q_weight, p.r_weight, p.horizon,
                             N_OBS)
    H = p.horizon

    @jax.jit
    def mk(key):
        ks = jax.random.split(key, 4)
        x0 = 0.1 * jax.random.normal(ks[0], (batch, 4), jnp.float32)
        x_ref = jnp.cumsum(0.2 * jax.random.normal(
            ks[1], (batch, H + 1, 4), jnp.float32), axis=1)
        hs_h = jax.random.normal(ks[2], (batch, H, N_OBS, 2), jnp.float32)
        hs_h = hs_h / jnp.linalg.norm(hs_h, axis=-1, keepdims=True)
        hs_g = jax.random.uniform(ks[3], (batch, H, N_OBS), jnp.float32,
                                  -1.5, 0.2)
        return x0, x_ref, hs_h, hs_g

    data = mk(jax.random.PRNGKey(seed))
    jax.block_until_ready(data)
    return prob, data


def assemble(prob, x0, x_ref, hs_h, hs_g):
    """Pre-assemble the QP matrices for one instance (outside the timed
    region so only solver cost is measured)."""
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models import (
        mpc_filter as mf)
    H, n, m = prob.horizon, prob.n_states, prob.n_inputs
    n_u, n_s = H * m, H * N_OBS
    dtype = prob.P.dtype
    with jax.default_matmul_precision("highest"):
        xr_flat = x_ref[1:H + 1].reshape(-1).astype(dtype)
        e0 = prob.Phi @ x0.astype(dtype) - xr_flat
        q_u = 2.0 * prob.q_weight * (prob.Gamma.T @ e0)
        theta0 = (prob.Phi @ x0.astype(dtype)).reshape(H, n)
        pos0 = theta0 @ prob.C.T
        HS_u = jnp.einsum("tjd,tdn->tjn", hs_h.astype(dtype),
                          prob.Theta).reshape(n_s, n_u)
        hs_rhs = (-hs_g.astype(dtype)
                  - jnp.einsum("tjd,td->tj", hs_h.astype(dtype),
                               pos0)).reshape(n_s)
        eye_u = jnp.eye(n_u, dtype=dtype)
        Theta_flat = prob.Theta.reshape(H * prob.n_outputs, n_u)
        u_max = jnp.tile(jnp.asarray([5.0, 5.0], dtype), H)
        p_max = jnp.tile(jnp.asarray([10.0, 10.0], dtype), H)
        G_u = jnp.concatenate([eye_u, -eye_u, Theta_flat, -Theta_flat])
        h1 = jnp.concatenate([u_max, u_max, p_max - pos0.reshape(-1),
                              p_max + pos0.reshape(-1)])
    return prob.P[:n_u, :n_u], q_u, G_u, h1, HS_u, hs_rhs, \
        2.0 * mf.SLACK_QUAD, mf.SLACK_LIN


def timed_loop(fn, k_iters, repeats=2):
    def t(a):
        t0 = time.perf_counter()
        float(fn(a))
        return time.perf_counter() - t0
    float(fn(jnp.int32(0)))
    t0 = min(t(jnp.int32(0)) for _ in range(repeats))
    float(fn(jnp.int32(k_iters)))
    tk = min(t(jnp.int32(k_iters)) for _ in range(repeats))
    return max(tk - t0, 1e-12) / k_iters


import contextlib


@contextlib.contextmanager
def fake_diag_linalg():
    """Ablation: monkeypatch the IPM's OWN factor/solve entry points
    (qp_ipm_structured.chol_factor_b / chol_solve_b — the real path on
    every backend, including the Pallas lane-batched one on TPU) with a
    diagonal solve (WRONG math, timing attribution only) so the variant
    measures everything in the IPM except the factorization/solves.
    Patching jax.scipy.linalg here would be a no-op: the structured IPM
    no longer calls it (ADVICE r3)."""
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops import (
        qp_ipm_structured as qps)
    real_f, real_s = qps.chol_factor_b, qps.chol_solve_b

    def fake_factor(S):
        return S

    def fake_solve(L, r):
        d = jnp.diagonal(L, axis1=-2, axis2=-1)
        return r / (d[..., None] if r.ndim == L.ndim else d)

    qps.chol_factor_b, qps.chol_solve_b = fake_factor, fake_solve
    jax.clear_caches()  # drop any jaxpr traced against the real path
    try:
        yield
    finally:
        qps.chol_factor_b, qps.chol_solve_b = real_f, real_s
        jax.clear_caches()


def bench_variant(prob, data, batch, linsolve, max_iters=35, k_iters=8,
                  polish=True, box=False):
    """`box=True` passes the [I;-I;Theta;-Theta] structure to the
    solver (spec prefix `bt`), measuring the structured-G_u path."""
    x0_0, x_ref, hs_h, hs_g = [d[:batch] for d in data]
    box_theta = (prob.Theta.reshape(prob.horizon * prob.n_outputs,
                                    prob.horizon * prob.n_inputs)
                 if box else None)

    asm = jax.vmap(lambda a, b, c, d: assemble(prob, a, b, c, d)[:6],
                   out_axes=(None, 0, 0, 0, 0, 0))
    P_uu1, q_u, G_u1, h1, HS_u, hs_rhs = asm(x0_0, x_ref, hs_h, hs_g)
    pss, qs = assemble(prob, x0_0[0], x_ref[0], hs_h[0], hs_g[0])[6:]
    jax.block_until_ready(q_u)

    @jax.jit
    def loop(k):
        def body(i, carry):
            q, acc = carry
            sol = jax.vmap(
                lambda qq, gu, hh1, au, bb: solve_mpc_qp(
                    P_uu1, qq, gu, hh1, au, bb, pss, qs,
                    max_iters=max_iters, tol=3e-5, polish=polish,
                    linsolve=linsolve, box_theta=box_theta)
            )(q, G_u1, h1, HS_u, hs_rhs)
            acc = acc + jnp.sum(sol.obj)
            q = q_u + 1e-6 * sol.u.sum(-1, keepdims=True)
            return q, acc
        _, acc = jax.lax.fori_loop(0, k, body, (q_u, jnp.float32(0.0)))
        return acc

    t = timed_loop(loop, k_iters)
    return batch / t


def make_polish_variant(mode):
    """Return a _polish substitute for timing attribution.

    Distinct max_iters per variant forces fresh jit traces despite the
    monkeypatch (solve_mpc_qp's jit cache is keyed on statics only).
    """
    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops import (
        qp_ipm_structured as qps)
    real = qps._polish

    if mode == "pnone":
        def variant(P_uu, q_u, G_u, h1, A, b, p_ss, q_s, reg,
                    u, s, l1, l2, l3, w1, w2, w3):
            return u, s, l1, l2, l3, w1, w2, w3
        return variant

    if mode in ("pref0", "pref1"):
        import inspect
        import re
        src = inspect.getsource(real)
        src = re.sub(r"range\(2\)", f"range({mode[-1]})", src)
        ns = dict(vars(qps))
        exec(src, ns)
        return ns["_polish"]

    def variant(P_uu, q_u, G_u, h1, A, b, p_ss, q_s, reg,
                u, s, l1, l2, l3, w1, w2, w3, _mode=mode):
        import jax.numpy as jnp
        import jax as _jax
        if _mode == "pnotopk":
            orig_topk = _jax.lax.top_k
            _jax.lax.top_k = lambda x, k: (x[:k], jnp.arange(k))
            try:
                return real(P_uu, q_u, G_u, h1, A, b, p_ss, q_s, reg,
                            u, s, l1, l2, l3, w1, w2, w3)
            finally:
                _jax.lax.top_k = orig_topk
        return real(P_uu, q_u, G_u, h1, A, b, p_ss, q_s, reg,
                    u, s, l1, l2, l3, w1, w2, w3)
    return variant


if __name__ == "__main__":
    specs = sys.argv[1:] or ["chol:2048", "inv:2048"]
    batch_max = max(int(s.split(":")[1]) for s in specs)
    prob, data = make_data(batch_max)
    for s in specs:
        parts = s.split(":")
        linsolve, batch = parts[0], int(parts[1])
        iters = int(parts[2]) if len(parts) > 2 else 35
        nopol = "nopol" in parts
        k = min(8, max(2, 8 * 2048 // batch))
        ctx = fake_diag_linalg() if linsolve == "diag" \
            else contextlib.nullcontext()
        patched = None
        if linsolve.startswith("p"):
            from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops import (
                qp_ipm_structured as qps)
            patched = qps._polish
            qps._polish = make_polish_variant(linsolve)
        try:
            with ctx:
                rate = bench_variant(
                    prob, data, batch,
                    "chol" if linsolve in ("diag", "bt") or patched
                    else linsolve,
                    max_iters=iters, k_iters=k,
                    polish=not nopol and linsolve != "diag",
                    box=linsolve == "bt")
        finally:
            if patched is not None:
                from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops import (
                    qp_ipm_structured as qps)
                qps._polish = patched
        print(f"{s}  {rate:9.1f} QP/s", flush=True)
