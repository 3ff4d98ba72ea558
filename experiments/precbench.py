"""Microbench: IPM-loop matmul precision ablation (VERDICT r3 task 2).

The structured IPM wraps its iteration loop in a configurable
`ipm_precision` while the polish/refinement/reported residuals stay at
HIGHEST (ops/qp_ipm_structured.solve_mpc_qp).  This measures the
throughput of each setting at the bench shape (batch 2048, H=30,
n_obs=3, 35 iters) and the control-agreement vs the HIGHEST setting --
deciding whether the default can drop below HIGHEST without risking
the <1e-4 on-chip oracle bound.  Experiment harness only.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from experiments.qpbench import assemble
from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.core.dynamics import (
    create_double_integrator_matrices)
from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.models.mpc_filter import (
    build_mpc_problem)
from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.qp_ipm_structured import (
    solve_mpc_qp)


def main(batch=2048, k_iters=8):
    A, B, C = create_double_integrator_matrices(0.2, dtype=jnp.float32)
    prob = build_mpc_problem(A, B, C, 2.0, 1.0, 30, 3)
    H = 30
    rng_key = jax.random.PRNGKey(0)

    @jax.jit
    def make(key):
        ks = jax.random.split(key, 4)
        x0 = 0.1 * jax.random.normal(ks[0], (batch, 4), jnp.float32)
        x_ref = jnp.cumsum(0.2 * jax.random.normal(
            ks[1], (batch, H + 1, 4), jnp.float32), axis=1)
        hs_h = jax.random.normal(ks[2], (batch, H, 3, 2), jnp.float32)
        hs_h = hs_h / jnp.linalg.norm(hs_h, axis=-1, keepdims=True)
        hs_g = jax.random.uniform(ks[3], (batch, H, 3), jnp.float32,
                                  -1.5, 0.2)
        return x0, x_ref, hs_h, hs_g

    x0, x_ref, hs_h, hs_g = make(rng_key)
    asm = jax.jit(jax.vmap(lambda a, b, c, d: assemble(prob, a, b, c, d)[:6],
                           out_axes=(None, 0, 0, 0, 0, 0)))
    P_uu, q_u, G_u, h1, HS_u, hs_rhs = asm(x0, x_ref, hs_h, hs_g)
    pss, qs = assemble(prob, x0[0], x_ref[0], hs_h[0], hs_g[0])[6:]
    jax.block_until_ready(q_u)

    u_ref_sol = None
    for prec in ("highest", "high", "default"):
        # All problem data enters as jit ARGUMENTS (closed-over device
        # arrays lower as embedded MLIR constants -- the compile hazard
        # bench.py/kbench.py document).
        @functools.partial(jax.jit, static_argnames=("p",))
        def loop(k, q_u, P_uu, G_u0, h10, HS_u, hs_rhs, p):
            def body(i, carry):
                q, acc = carry
                sol = jax.vmap(lambda qq, g, r: solve_mpc_qp(
                    P_uu, qq, G_u0, h10, g, r, pss, qs,
                    max_iters=35, tol=3e-5, ipm_precision=p))(
                        q, HS_u, hs_rhs)
                return q_u + 1e-6 * sol.u, acc + jnp.sum(sol.obj)
            _, acc = jax.lax.fori_loop(0, k, body,
                                       (q_u, jnp.float32(0.0)))
            return acc

        def t(kk):
            t0 = time.perf_counter()
            float(loop(jnp.int32(kk), q_u, P_uu, G_u[0], h1[0],
                       HS_u, hs_rhs, prec))
            return time.perf_counter() - t0

        float(loop(jnp.int32(0), q_u, P_uu, G_u[0], h1[0],
                   HS_u, hs_rhs, prec))
        t0 = min(t(0) for _ in range(3))
        float(loop(jnp.int32(k_iters), q_u, P_uu, G_u[0], h1[0],
                   HS_u, hs_rhs, prec))
        tk = min(t(k_iters) for _ in range(3))
        per = max(tk - t0, 1e-9) / k_iters

        sol = jax.vmap(lambda qq, g, r: solve_mpc_qp(
            P_uu, qq, G_u[0], h1[0], g, r, pss, qs,
            max_iters=35, tol=3e-5, ipm_precision=prec))(q_u, HS_u, hs_rhs)
        u = np.asarray(sol.u)
        conv = float(np.mean(np.asarray(sol.converged)))
        if prec == "highest":
            u_ref_sol = u
            dev = 0.0
        else:
            dev = float(np.max(np.abs(u - u_ref_sol)))
        print(f"{prec:8s}: {per*1e3:7.2f} ms/iter "
              f"{batch/per:9.0f} QP/s  conv={conv:.3f} "
              f"max|u-u_highest|={dev:.2e}", flush=True)


if __name__ == "__main__":
    main()
