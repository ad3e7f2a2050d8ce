"""iLQR closed-loop test (reference car_racing/tests/ilqr_test.py pattern:
ego with iLQR + CBF repelling cost vs one prescribed car)."""

import numpy as np

from car_racing_tpu.ops import track as track_ops
from car_racing_tpu.racing import policies, simulator, vehicles
from car_racing_tpu.utils import params
from car_racing_tpu.utils.constants import X_DIM


def run_ilqr_sim(obs_s_coef, obs_ey_coef, sim_time=15.0, warm_start=True):
    spec = np.genfromtxt("data/track_layout/ellipse.csv", delimiter=",")
    track = track_ops.build_track(spec, width=1.0)
    ego = vehicles.DynamicBicycleModel(name="ego", system_param=params.SystemParam.default())
    ego.set_zero_noise()
    ego.set_state_curvilinear(np.zeros(X_DIM))
    ego.set_state_global(np.zeros(X_DIM))
    ego.start_logging()
    ilqr_param = params.ILQRParam.default(vt=0.8)
    policy = policies.iLQRRacing(
        ilqr_param, params.SystemParam.default(), warm_start=warm_start
    )
    policy.set_timestep(0.1)
    policy.set_track(track)
    ego.set_ctrl_policy(policy)
    ego.set_track(track)

    car1 = vehicles.NoDynamicsModel(name="car1")
    car1.set_track(track)
    car1.set_state_curvilinear_func(obs_s_coef, obs_ey_coef)
    car1.start_logging()

    sim = simulator.CarRacingSim()
    sim.set_timestep(0.1)
    sim.set_track(track)
    sim.add_vehicle(ego)
    policy.set_racing_sim(sim)
    sim.add_vehicle(car1)
    sim.sim(sim_time=sim_time)
    return sim, track, ego


def test_ilqr_tracks_with_clear_road():
    """Obstacle far ahead and fast: ego reaches its target speed."""
    sim, track, ego = run_ilqr_sim([0.8, 15.0], [0.0, 0.1])
    traj = sim.full_trajectory("ego")
    tail = traj[len(traj) // 2 :]
    assert abs(tail[:, 0].mean() - 0.8) < 0.2
    assert np.abs(traj[:, 5]).max() < 1.0


def test_ilqr_follows_blocking_car_without_collision():
    """Slow car in the ego's lane, COLD solves (warm_start=False): the CBF
    repelling cost makes the ego brake and follow at the leader's speed (no
    overtake logic in the reference's iLQR — control.py:64-195 only repels;
    cold zero-init pins that reference behavior).  The default warm-started
    config instead finds the passing optimum — covered by
    tests/test_fused.py::test_fused_ilqr_warm_start_passes_blocking_car."""
    sim, track, ego = run_ilqr_sim([0.2, 5.0], [0.0, 0.1], warm_start=False)
    traj = sim.full_trajectory("ego")
    tail = traj[len(traj) // 2 :]
    # settles near the leader's speed, never crawls to a stop
    assert 0.1 < tail[:, 0].mean() < 0.45
    # never rams the leader: gap in s stays positive
    ego_traj = np.asarray(ego.xcurv_log)
    t = np.arange(len(ego_traj)) * 0.1
    s_obs = np.polyval([0.2, 5.0], t)
    assert (s_obs - ego_traj[:, 4] > 0.3).all()
