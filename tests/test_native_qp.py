"""Native C++ QP solver tests (native/qp_solver.cpp via ctypes)."""

import numpy as np
import pytest

from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops import (
    native_qp)

pytestmark = pytest.mark.skipif(not native_qp.available(),
                                reason="native toolchain unavailable")


def _random_qp(seed, n, m):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(n, n))
    return (L @ L.T + np.eye(n), rng.normal(size=n),
            rng.normal(size=(m, n)), rng.uniform(0.1, 2.0, size=m))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_scipy(seed):
    from scipy.optimize import LinearConstraint, minimize
    P, q, G, h = _random_qp(seed, 12, 24)
    sol = native_qp.solve_qp_native(P, q, G, h)
    assert sol.converged
    res = minimize(lambda z: 0.5 * z @ P @ z + q @ z, np.zeros(12),
                   jac=lambda z: P @ z + q,
                   constraints=[LinearConstraint(G, -np.inf, h)],
                   method="trust-constr",
                   options={"gtol": 1e-12, "xtol": 1e-14})
    np.testing.assert_allclose(sol.z, res.x, atol=5e-6)


def test_native_matches_jax_ipm():
    """C++ and JAX IPMs agree (independent implementations)."""
    import jax.numpy as jnp

    from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.qp_ipm import (
        solve_qp)
    P, q, G, h = _random_qp(10, 20, 40)
    native = native_qp.solve_qp_native(P, q, G, h)
    jaxsol = solve_qp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(G),
                      jnp.asarray(h))
    assert native.converged and bool(jaxsol.converged)
    np.testing.assert_allclose(native.z, np.asarray(jaxsol.z), atol=1e-6)


def test_native_active_box():
    n = 5
    P = 2 * np.eye(n)
    q = -4 * np.ones(n)
    G = np.eye(n)
    h = np.ones(n)
    sol = native_qp.solve_qp_native(P, q, G, h)
    assert sol.converged
    np.testing.assert_allclose(sol.z, np.ones(n), atol=1e-8)
