"""Closed-loop smoke + numeric tests: PID and MPC-LTI tracking on l_shape
(the reference CI test, tests/auto_control_test.py:7-36, plus actual
numeric assertions the reference never had)."""

import numpy as np
import pytest

from car_racing_tpu.ops import track as track_ops
from car_racing_tpu.racing import policies, simulator, vehicles
from car_racing_tpu.utils.constants import X_DIM
from car_racing_tpu.utils import params


@pytest.fixture(scope="module")
def track():
    spec = np.genfromtxt("data/track_layout/l_shape.csv", delimiter=",")
    return track_ops.build_track(spec, width=0.8)


def make_ego(track, timestep=0.1):
    ego = vehicles.DynamicBicycleModel(name="ego", system_param=params.SystemParam.default())
    ego.set_zero_noise()
    ego.set_state_curvilinear(np.zeros(X_DIM))
    ego.set_state_global(np.zeros(X_DIM))
    ego.start_logging()
    return ego


def run_tracking(track, policy, sim_time, timestep=0.1):
    ego = make_ego(track)
    sim = simulator.CarRacingSim()
    sim.set_timestep(timestep)
    sim.set_track(track)
    sim.add_vehicle(ego)
    policy.set_timestep(timestep)
    policy.set_track(track)
    policy.set_racing_sim(sim)
    ego.set_ctrl_policy(policy)
    sim.sim(sim_time=sim_time)
    return sim, ego


def test_pid_tracking_converges(track):
    sim, ego = run_tracking(track, policies.PIDTracking(vt=0.8), sim_time=20.0)
    traj = sim.full_trajectory("ego")
    # converged to target speed and stays on track
    tail = traj[len(traj) // 2 :]
    assert abs(tail[:, 0].mean() - 0.8) < 0.1
    assert np.abs(tail[:, 5]).max() < 0.8
    # made forward progress (s wrapped per lap; total distance via logs)
    total_s = ego.laps * float(track.lap_length) + traj[-1, 4]
    assert total_s > 10.0


def test_mpc_lti_tracking(track):
    mpc_param = params.MPCParam.default(vt=0.8)
    sim, ego = run_tracking(
        track, policies.MPCTracking(mpc_param, params.SystemParam.default()), sim_time=20.0
    )
    traj = sim.full_trajectory("ego")
    tail = traj[len(traj) // 2 :]
    assert abs(tail[:, 0].mean() - 0.8) < 0.1
    assert np.abs(tail[:, 5]).max() < 0.8
    # MPC should track ey ~ 0 tighter than the generous bound
    assert np.abs(tail[:, 5]).mean() < 0.15


def test_mpc_respects_input_bounds(track):
    mpc_param = params.MPCParam.default(vt=0.8)
    sysp = params.SystemParam.default()
    sim, ego = run_tracking(track, policies.MPCTracking(mpc_param, sysp), sim_time=8.0)
    u = np.asarray([u for lap in ego.inputs for u in lap] + list(ego.lap_inputs))
    assert np.abs(u[:, 0]).max() <= float(sysp.delta_max) + 1e-6
    assert np.abs(u[:, 1]).max() <= float(sysp.a_max) + 1e-6


def test_lqr_tracking(track):
    lqr_param = params.LQRParam.default(vt=0.8)
    sim, ego = run_tracking(
        track, policies.LQRTracking(lqr_param, params.SystemParam.default()), sim_time=20.0
    )
    traj = sim.full_trajectory("ego")
    tail = traj[len(traj) // 2 :]
    assert abs(tail[:, 0].mean() - 0.8) < 0.15
    assert np.abs(tail[:, 5]).max() < 0.8
