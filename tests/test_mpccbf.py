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


def test_warm_select_matches_separate_configs():
    """mpc_multi_agents(warm_select=...) — the runtime cold/warm merged
    solve the racing game uses — must reproduce the two separate static
    configurations on the same problem: cold side vs (warm=None,
    iters=cold budget), warm side vs (warm=triple, iters=warm budget).
    The executed update sequences are identical by construction; the only
    permitted difference is compilation-level rounding (~1e-13, the reason
    host AND fused both use the merged call — see policies.py)."""
    import jax.numpy as jnp

    from car_racing_tpu.models import controllers
    from car_racing_tpu.utils import params

    rgp = params.RacingGameParam.default(alpha=0.8)
    sysp = params.SystemParam.default()
    Nc = rgp.num_horizon_ctrl
    n_obs = 4
    x = jnp.asarray([2.0, 0.01, 0.0, 0.02, 5.0, -0.1])
    x_t = jnp.zeros((Nc, X_DIM)).at[:, 0].set(2.0).at[:, 5].set(-0.2)
    obs = np.zeros((n_obs, Nc + 1, X_DIM))
    obs[0, :, 4] = 5.5 + 0.07 * np.arange(Nc + 1)
    obs[0, :, 5] = -0.3
    obs[1, :, 4] = 6.5 + 0.07 * np.arange(Nc + 1)
    obs[1, :, 5] = -0.5
    mask = jnp.asarray([True, True, False, False])
    ah = jnp.asarray([0.2, 0.1])
    ohs = jnp.where(mask[:, None], ah[None], 1.0)
    args = (
        x, x_t, rgp.A, rgp.B, rgp.Q, rgp.R, sysp, jnp.asarray(1.0),
        jnp.asarray(obs), mask, ah, ohs, jnp.asarray(19.2),
    )
    nz = Nc * 2 + n_obs * (Nc + 1)
    m = 2 * Nc * 2 + 4 * Nc + n_obs * (2 * Nc + 1)
    placeholder = (
        jnp.zeros(nz).at[Nc * 2:].set(0.1), jnp.full(m, 1.0), jnp.full(m, 0.1)
    )

    # cold
    _, Ua, _, sola = controllers.mpc_multi_agents(*args, warm=None, iters=40)
    _, Ub, _, solb = controllers.mpc_multi_agents(
        *args, iters=40, warm_select=(jnp.asarray(False), placeholder),
        iters_warm=20,
    )
    np.testing.assert_allclose(np.asarray(Ua), np.asarray(Ub), atol=1e-9)
    assert int(sola.iterations) == int(solb.iterations)

    # warm from the cold solution's shifted-style triple
    warm = (sola.z, sola.lam, sola.s)
    _, Uc, _, solc = controllers.mpc_multi_agents(*args, warm=warm, iters=20)
    _, Ud, _, sold = controllers.mpc_multi_agents(
        *args, iters=40, warm_select=(jnp.asarray(True), warm), iters_warm=20
    )
    np.testing.assert_allclose(np.asarray(Uc), np.asarray(Ud), atol=1e-9)
    assert int(solc.iterations) == int(sold.iterations)

    # warm_if without a dual triple is a caller bug, rejected loudly
    from car_racing_tpu.ops import ipm

    with pytest.raises(ValueError):
        ipm.solve_qp_nl(
            jnp.eye(2), jnp.zeros(2), jnp.eye(2), jnp.full(2, -1.0),
            lambda z: (jnp.zeros(0), jnp.zeros((0, 2))), jnp.zeros(2),
            warm_if=jnp.asarray(True),
        )
