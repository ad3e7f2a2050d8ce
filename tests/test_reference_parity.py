"""Golden closed-loop trajectory regression tests.

CasADi/IPOPT cannot be installed in this environment, so trajectories of
the reference itself cannot be recorded (BASELINE "match IPOPT within its
optimality gap" is instead enforced by the KKT-residual gates in
tests/test_four_tracks.py and the scipy parity tests in tests/test_ipm.py).
These goldens are the rebuild's own zero-noise trajectories, recorded on
CPU f64 by ``python -m car_racing_tpu.utils.golden_fixtures`` — they pin
closed-loop behavior permanently: any future change to the solvers,
dynamics, track geometry, or warm-start plumbing that shifts a controller's
closed-loop path fails here and must consciously regenerate the goldens.
"""

import numpy as np
import pytest

from car_racing_tpu.utils.golden_fixtures import GOLDEN_DIR, _scenarios


@pytest.fixture(scope="module")
def current():
    return _scenarios()


# tolerances: PID is a pure function of state (bitwise-stable); the MPC
# paths run fixed-iteration IPMs whose last bits can move with XLA fusion
# choices, and closed loops amplify that — tolerances are loose enough for
# compiler drift, tight enough to catch real behavior changes (which move
# trajectories by >> 1e-2).
CASES = [
    ("pid_l_shape", 1e-8),
    ("mpc_lti_l_shape", 1e-4),
    ("mpccbf_l_shape", 1e-2),
    ("lmpc_lap_l_shape", 1e-2),
    ("ilqr_ellipse", 1e-3),
    ("racing_game_l_shape", 1e-2),
    ("mpc_lti_goggle", 1e-4),
    ("lmpc_lap_goggle", 1e-2),
    ("mpc_lti_m_shape", 1e-4),
    ("lmpc_lap_m_shape", 1e-2),
    ("racing_game_m_shape", 1e-2),
    ("lmpc_lap_ellipse", 1e-2),
]


@pytest.mark.parametrize("name,atol", CASES)
def test_golden_trajectory(name, atol, current):
    golden = np.loadtxt(f"{GOLDEN_DIR}/{name}.csv", delimiter=",")
    traj = np.asarray(current[name])
    # the LMPC lap length may shift by a step or two on a real change; the
    # shape check is part of the gate
    assert traj.shape == golden.shape, (traj.shape, golden.shape)
    np.testing.assert_allclose(traj, golden, atol=atol, err_msg=name)
