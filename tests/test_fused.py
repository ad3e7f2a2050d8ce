"""Fused on-device rollout must reproduce the host-loop simulation."""

import numpy as np
import jax.numpy as jnp
import pytest

from car_racing_tpu.ops import dynamics, track as track_ops
from car_racing_tpu.racing import fused, policies, simulator, vehicles
from car_racing_tpu.utils import params
from car_racing_tpu.utils.constants import X_DIM


def test_fused_rollout_matches_host_loop():
    spec = np.genfromtxt("data/track_layout/l_shape.csv", delimiter=",")
    track = track_ops.build_track(spec, width=0.8)
    mpc_param = params.MPCParam.default(vt=0.8)
    sysp = params.SystemParam.default()
    bike = dynamics.BicycleParams.default()
    xtarget = jnp.asarray(np.array([0.8, 0, 0, 0, 0, 0.0]))

    n_steps = 60
    xcurvs, us = fused.rollout_mpc_tracking(
        track, bike, mpc_param, sysp, xtarget,
        jnp.zeros(X_DIM), jnp.zeros(X_DIM), n_steps=n_steps,
    )
    xcurvs = np.asarray(xcurvs)

    # host loop (same zero-noise config)
    ego = vehicles.DynamicBicycleModel(name="ego", system_param=sysp)
    ego.set_zero_noise()
    ego.set_state_curvilinear(np.zeros(X_DIM))
    ego.set_state_global(np.zeros(X_DIM))
    ego.start_logging()
    sim = simulator.CarRacingSim()
    sim.set_timestep(0.1)
    sim.set_track(track)
    sim.add_vehicle(ego)
    pol = policies.MPCTracking(mpc_param, sysp)
    pol.set_timestep(0.1)
    pol.set_track(track)
    pol.set_racing_sim(sim)
    ego.set_ctrl_policy(pol)
    sim.sim(sim_time=n_steps * 0.1)
    host_traj = np.asarray(ego.xcurv_log)

    # trajectories agree (same solver, same dynamics; small drift tolerated
    # from warm-start path differences)
    m = min(len(host_traj), n_steps)
    np.testing.assert_allclose(xcurvs[1 : m + 1, 0], host_traj[:m, 0], atol=2e-2)
    np.testing.assert_allclose(xcurvs[1 : m + 1, 5], host_traj[:m, 5], atol=2e-2)


def test_fused_batch_rollout():
    spec = np.genfromtxt("data/track_layout/l_shape.csv", delimiter=",")
    track = track_ops.build_track(spec, width=0.8)
    mpc_param = params.MPCParam.default(vt=0.8)
    sysp = params.SystemParam.default()
    bike = dynamics.BicycleParams.default()
    xtarget = jnp.asarray(np.array([0.8, 0, 0, 0, 0, 0.0]))
    B = 4
    xc0 = jnp.zeros((B, X_DIM)).at[:, 5].set(jnp.linspace(-0.2, 0.2, B))
    xg0 = jnp.zeros((B, X_DIM))
    xcurvs, us = fused.rollout_mpc_tracking_batch(
        track, bike, mpc_param, sysp, xtarget, xc0, xg0, n_steps=30
    )
    assert xcurvs.shape == (B, 31, X_DIM)
    # all lanes converge toward centerline and target speed
    final = np.asarray(xcurvs[:, -1])
    assert np.abs(final[:, 5]).max() < 0.1
    assert np.abs(final[:, 0] - 0.8).max() < 0.1
