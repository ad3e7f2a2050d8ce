"""IPOPT-parity configuration coverage: the solver quality gates of
BASELINE.json on all four stock layouts (l_shape, m_shape, goggle, ellipse).

Since the reference's IPOPT is not importable here, parity is asserted
structurally: the interior-point solution must satisfy the KKT conditions
to IPOPT-default-like tolerance (residual < 1e-7, feasibility < 1e-8) on a
sweep of realistic states, and closed-loop MPC must track on every layout.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from car_racing_tpu.models import controllers
from car_racing_tpu.ops import ipm, track as track_ops
from car_racing_tpu.racing import policies, simulator, vehicles
from car_racing_tpu.utils import params
from car_racing_tpu.utils.constants import X_DIM

LAYOUTS = ["l_shape", "m_shape", "goggle", "ellipse"]


@pytest.fixture(scope="module", params=LAYOUTS)
def track(request):
    spec = np.genfromtxt(f"data/track_layout/{request.param}.csv", delimiter=",")
    return track_ops.build_track(spec, width=0.8)


def test_mpc_kkt_quality_state_sweep(track):
    """KKT residual and feasibility of the tracking QP across a sweep of
    realistic states — the 'within IPOPT's optimality gap and
    constraint-violation tolerance' gate (BASELINE.md)."""
    mpc_param = params.MPCParam.default(vt=0.8)
    sysp = params.SystemParam.default()
    xtarget = jnp.asarray(np.array([0.8, 0, 0, 0, 0, 0.0]))
    rng = np.random.default_rng(0)
    L = float(track.lap_length)
    for _ in range(20):
        x = jnp.asarray(
            [
                rng.uniform(0.1, 1.5),
                rng.normal() * 0.1,
                rng.normal() * 0.3,
                rng.normal() * 0.2,
                rng.uniform(0, L),
                rng.uniform(-0.6, 0.6),
            ]
        )
        qp, phi, G = controllers._tracking_qp(mpc_param, sysp, track.width, x, xtarget)
        sol = ipm.solve_qp(qp, jnp.zeros(qp.H.shape[0]), iters=30)
        assert float(sol.kkt_res) < 1e-7, (float(sol.kkt_res), np.asarray(x))
        ci = np.asarray(qp.C @ sol.z - qp.d)
        assert ci.min() > -1e-8


def test_mpc_closed_loop_tracks(track):
    """One closed-loop run per layout: target speed reached, stays on
    track (the four-track functional-parity configs)."""
    ego = vehicles.DynamicBicycleModel(name="ego", system_param=params.SystemParam.default())
    ego.set_zero_noise()
    ego.set_state_curvilinear(np.zeros(X_DIM))
    ego.set_state_global(np.zeros(X_DIM))
    ego.start_logging()
    sim = simulator.CarRacingSim()
    sim.set_timestep(0.1)
    sim.set_track(track)
    sim.add_vehicle(ego)
    pol = policies.MPCTracking(params.MPCParam.default(vt=0.8), params.SystemParam.default())
    pol.set_timestep(0.1)
    pol.set_track(track)
    pol.set_racing_sim(sim)
    ego.set_ctrl_policy(pol)
    sim.sim(sim_time=15.0)
    traj = sim.full_trajectory("ego")
    tail = traj[len(traj) // 2 :]
    assert abs(tail[:, 0].mean() - 0.8) < 0.1
    assert np.abs(traj[:, 5]).max() < 0.8
