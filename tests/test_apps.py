"""CLI driver smoke tests (the reference's L7 entry scripts as modules)."""

import subprocess
import sys

import numpy as np
import pytest

from car_racing_tpu.models import system_identification as sysid


def test_sysid_linear_regression_recovers_lti():
    """Ridge regression recovers a known LTI system from synthetic data."""
    rng = np.random.default_rng(0)
    A_true = 0.9 * np.eye(6) + 0.02 * rng.normal(size=(6, 6))  # stable
    B_true = 0.1 * rng.normal(size=(6, 2))
    T = 300
    x = np.zeros((T, 6))
    u = 0.1 * rng.normal(size=(T, 2))
    x[0] = rng.normal(size=6) * 0.1
    for k in range(T - 1):
        x[k + 1] = A_true @ x[k] + B_true @ u[k]
    A, B, error = sysid.linear_regression(x, u, lamb=1e-10)
    np.testing.assert_allclose(A, A_true, atol=1e-6)
    np.testing.assert_allclose(B, B_true, atol=1e-6)


# every reference entry script (SURVEY §2.21) has a driver here; each runs
# end-to-end in CI with a capped sim horizon.  The lap-protocol drivers
# (lmpc, overtake) get a cap long enough to complete their laps and tiny
# lap counts — slow-ish, but they execute the full wiring including the
# flags that rotted silently in round 1 (--sim-replay, --save-trajectory).
_DRIVERS = [
    ("car_racing_tpu.apps.control_test",
     ["--ctrl-policy", "pid", "--simulation", "--zero-noise"], 3.0),
    ("car_racing_tpu.apps.control_test",
     ["--ctrl-policy", "lqr", "--simulation", "--zero-noise"], 3.0),
    ("car_racing_tpu.apps.control_test",
     ["--ctrl-policy", "mpc-lti", "--simulation", "--zero-noise"], 3.0),
    ("car_racing_tpu.apps.ilqr_test",
     ["--simulation", "--zero-noise", "--track-layout", "l_shape"], 3.0),
    ("car_racing_tpu.apps.mpccbf_test",
     ["--simulation", "--zero-noise"], 3.0),
    ("car_racing_tpu.apps.system_identification_test", [], 3.0),
    ("car_racing_tpu.apps.lmpc_test",
     ["--simulation", "--zero-noise", "--lap-number", "3"], 40.0),
    ("car_racing_tpu.apps.overtake_planner_test",
     ["--simulation", "--zero-noise", "--lap-number", "4",
      "--number-other-agents", "2"], 90.0),
]


@pytest.mark.parametrize("module,extra,cap", _DRIVERS,
                         ids=[f"{m.rsplit('.',1)[1]}-{'-'.join(e[:2]) or 'default'}"
                              for m, e, _ in _DRIVERS])
def test_cli_driver_runs(module, extra, cap, tmp_path, repo_root):
    """Drivers must parse the reference flag surface and run a short sim."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['x'] + %r;"
        "from %s import main;"
        "import car_racing_tpu.apps.common as c;"
        # shrink sim horizon for CI speed
        "import car_racing_tpu.racing.simulator as s;"
        "orig = s.CarRacingSim.sim;"
        "s.CarRacingSim.sim = lambda self, sim_time=1.0, **kw: orig(self, sim_time=min(sim_time, %r), **kw);"
        "main()"
        % (extra, module, cap)
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        cwd=repo_root,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_overtake_driver_replay_flag(tmp_path, repo_root):
    """--sim-replay must reuse the saved run's other-vehicle initial
    conditions (reference overtake_planner_test.py:61-74); --mesh-planner
    dispatches the corridor QPs over the 8 virtual devices (inherited
    XLA_FLAGS), exercising the racing game's multi-chip planner path
    end-to-end.  Depends on the saved simulator produced by the overtake
    driver run above."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['x', '--simulation', '--zero-noise',"
        " '--lap-number', '4', '--sim-replay', '--mesh-planner'];"
        "from car_racing_tpu.apps.overtake_planner_test import main;"
        "import car_racing_tpu.racing.simulator as s;"
        "orig = s.CarRacingSim.sim;"
        "s.CarRacingSim.sim = lambda self, sim_time=1.0, **kw: orig(self, sim_time=min(sim_time, 40.0), **kw);"
        "main()"
    )
    import os

    if not os.path.exists(os.path.join(repo_root, "data/simulator/racing_game_l_shape.obj")):
        pytest.skip("no saved racing-game run to replay (run the driver test first)")
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=repo_root, capture_output=True, text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_overtake_driver_path_planner_flag(repo_root):
    """--path-planner runs the racing game with the path-based planner
    dispatch (LMPCRacingGame(path_planner=True)) end-to-end — the planner
    choice the reference hardcodes off (base.py:414).  Capped sim time;
    success = the full protocol completes with the ey-profile planner."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['x', '--simulation', '--zero-noise',"
        " '--lap-number', '4', '--path-planner'];"
        "from car_racing_tpu.apps.overtake_planner_test import main;"
        "import car_racing_tpu.racing.simulator as s;"
        "orig = s.CarRacingSim.sim;"
        "s.CarRacingSim.sim = lambda self, sim_time=1.0, **kw: orig(self, sim_time=min(sim_time, 40.0), **kw);"
        "main()"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=repo_root, capture_output=True, text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
