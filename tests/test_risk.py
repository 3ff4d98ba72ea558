"""Risk-metric tests: reference index conventions and exact CVaR
(reference core/risk_metrics.py:35-82)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.core.risk import (
    cvar_from_kth, cvar_metric, cvar_rockafellar, expected_value, var_metric)
from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.ops.halfspace import (
    kth_largest_radix_select)
from oracle import empirical_cvar_lp


def _ref_var(samples, alpha):
    """Reference convention: sort ascending, index ceil(N(1-alpha)) - 1
    (reference core/risk_metrics.py:58-60)."""
    s = np.sort(samples)
    idx = int(math.ceil(len(samples) * (1 - alpha)))
    return s[idx - 1]


@pytest.mark.parametrize("alpha", [0.1, 0.2, 0.5])
@pytest.mark.parametrize("n", [7, 20, 101])
def test_var_metric_reference_convention(alpha, n):
    rng = np.random.default_rng(0)
    x = rng.normal(size=n)
    assert float(var_metric(jnp.asarray(x), alpha)) == pytest.approx(
        _ref_var(x, alpha))


@pytest.mark.parametrize("alpha", [0.1, 0.2, 0.5])
def test_cvar_metric_reference_convention(alpha):
    rng = np.random.default_rng(1)
    x = rng.normal(size=50)
    var = _ref_var(x, alpha)
    expected = x[x >= var].mean()
    assert float(cvar_metric(jnp.asarray(x), alpha)) == pytest.approx(expected)


def test_expected_value():
    x = np.arange(12.0).reshape(3, 4)
    np.testing.assert_allclose(expected_value(jnp.asarray(x)), x.mean(0))


@pytest.mark.parametrize("alpha", [0.07, 0.1, 0.2, 0.33, 0.5])
@pytest.mark.parametrize("n", [5, 20, 100, 333])
def test_cvar_rockafellar_vs_lp(alpha, n):
    """Exact top-k CVaR equals the Rockafellar-Uryasev LP optimum --
    the quantity the reference's ECOS programs minimize over."""
    rng = np.random.default_rng(int(n * 100 * alpha))
    x = rng.normal(size=n)
    ours = float(cvar_rockafellar(jnp.asarray(x), alpha))
    lp = empirical_cvar_lp(x, alpha)
    assert ours == pytest.approx(lp, abs=1e-8)


def test_cvar_rockafellar_with_ties():
    x = np.array([3.0, 3.0, 3.0, 1.0, 1.0, 0.0, 0.0, -1.0, 2.0, 3.0])
    for alpha in [0.1, 0.25, 0.3, 0.4]:
        ours = float(cvar_rockafellar(jnp.asarray(x), alpha))
        lp = empirical_cvar_lp(x, alpha)
        assert ours == pytest.approx(lp, abs=1e-9), alpha


def test_cvar_rockafellar_batched():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 6, 50))
    out = cvar_rockafellar(jnp.asarray(x), 0.2)
    assert out.shape == (4, 6)
    for i in range(4):
        for j in range(6):
            assert float(out[i, j]) == pytest.approx(
                empirical_cvar_lp(x[i, j], 0.2), abs=1e-8)


@pytest.mark.parametrize("k", [1, 3, 10, 50])
def test_radix_select_kth_largest(k):
    rng = np.random.default_rng(k)
    x = rng.normal(size=(5, 50)).astype(np.float32) * 100
    out = kth_largest_radix_select(jnp.asarray(x), k)
    expected = np.sort(x, axis=-1)[:, ::-1][:, k - 1]
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_radix_select_with_negatives_and_ties():
    x = np.array([[-5.0, -5.0, -1.0, 0.0, 0.0, 2.5, 2.5, -3.0]],
                 dtype=np.float32)
    for k in range(1, 9):
        out = float(kth_largest_radix_select(jnp.asarray(x), k)[0])
        expected = np.sort(x[0])[::-1][k - 1]
        assert out == expected, k


def test_cvar_from_kth_matches_rockafellar():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(3, 40)).astype(np.float32)
    alpha = 0.2
    k = math.ceil(alpha * 40)
    kth = kth_largest_radix_select(jnp.asarray(x), k)
    via_kth = cvar_from_kth(jnp.asarray(x), kth, alpha)
    direct = cvar_rockafellar(jnp.asarray(x), alpha)
    np.testing.assert_allclose(np.asarray(via_kth), np.asarray(direct),
                               rtol=1e-6)
