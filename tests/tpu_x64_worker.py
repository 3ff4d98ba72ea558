"""Worker: x64-enabled TPU process must not crash in the halfspace path.

VERDICT r2 weak #2: with `jax_enable_x64=True`, lowering the fused
Pallas kernel dies in Mosaic (`_convert_helper` RecursionError).  The
production gate (simulation/environment._use_pallas_auto) must detect
x64 and route to the XLA closed form instead.  This worker enables x64
BEFORE touching the backend, runs the production halfspace entry point
on the chip, and cross-checks the result against the f32 closed form.
Exit 77 = no TPU attached.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_enable_x64", True)

    if jax.default_backend() != "tpu":
        print(f"no TPU (backend={jax.default_backend()}); skipping")
        return 77
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    import numpy as np
    import jax.numpy as jnp

    import dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.simulation.environment as env_mod

    env = env_mod.Environment(robot_radius=0.3, obstacle_radius=0.3,
                              horizon=6, dt=0.2, alpha=0.2, delta=0.1,
                              epsilon=0.15, dtype=jnp.float32)
    assert env_mod._use_pallas_auto(env) is False, \
        "pallas gate must be OFF under x64"

    rng = np.random.default_rng(7)
    samples = jnp.asarray(rng.normal(size=(2, 50, 7, 2)), jnp.float32)
    x_ref = jnp.asarray(np.cumsum(rng.normal(size=(7, 4)), axis=0),
                        jnp.float32)
    # Production entry point with the default (auto) path: must execute
    # on the chip without a Mosaic crash.
    hs = env_mod.compute_safe_halfspaces_for_trajectory(env, samples, x_ref)
    got = np.asarray(hs.dr_cvar.g_tilde)

    # Cross-check against the explicit XLA path.
    want = np.asarray(env_mod.compute_safe_halfspaces_for_trajectory(
        env, samples, x_ref, use_pallas=False).dr_cvar.g_tilde)
    np.testing.assert_allclose(got, want, atol=1e-5)
    print("x64 fallback on chip OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
