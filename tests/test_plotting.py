"""Headless plotting/animation smoke tests."""

import os

import numpy as np

from car_racing_tpu.ops import track as track_ops
from car_racing_tpu.racing import plotting, policies, simulator, vehicles
from car_racing_tpu.utils import params
from car_racing_tpu.utils.constants import X_DIM


def _short_sim():
    spec = np.genfromtxt("data/track_layout/l_shape.csv", delimiter=",")
    track = track_ops.build_track(spec, width=0.8)
    ego = vehicles.DynamicBicycleModel(name="ego", system_param=params.SystemParam.default())
    ego.set_zero_noise()
    ego.set_state_curvilinear(np.zeros(X_DIM))
    ego.set_state_global(np.zeros(X_DIM))
    ego.start_logging()
    sim = simulator.CarRacingSim()
    sim.set_timestep(0.1)
    sim.set_track(track)
    sim.add_vehicle(ego)
    pid = policies.PIDTracking(vt=0.8)
    pid.set_timestep(0.1)
    pid.set_track(track)
    pid.set_racing_sim(sim)
    ego.set_ctrl_policy(pid)
    sim.sim(sim_time=3.0)
    return sim


def test_plots_and_animation(tmp_path):
    sim = _short_sim()
    p1 = tmp_path / "state.png"
    p2 = tmp_path / "input.png"
    p3 = tmp_path / "traj.png"
    plotting.plot_state(sim, "ego", save_path=str(p1))
    plotting.plot_input(sim, "ego", save_path=str(p2))
    plotting.plot_simulation(sim, save_path=str(p3))
    for p in (p1, p2, p3):
        assert p.exists() and p.stat().st_size > 1000
    gif = plotting.animate(sim, filename="t", ani_time=10, save_dir=str(tmp_path))
    assert os.path.exists(gif) and os.path.getsize(gif) > 1000
