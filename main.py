"""CLI shim: same entry surface as the reference (`python main.py ...`,
reference main.py:188-236).  The implementation lives in the installable
package (`dr_cvar_..._tpu/cli.py`), also exposed as the `dr-cvar-filter`
console script (pyproject.toml)."""

from dr_cvar_mpc_safety_filter_motion_planning_collison_avoidance_tpu.cli import (  # noqa: E501
    main)

if __name__ == "__main__":
    main()
