"""Golden closed-loop trajectory fixtures (regression goldens).

CasADi/IPOPT cannot be installed in the build environment, so reference
closed-loop trajectories cannot be recorded directly.  Instead these are
the REBUILD'S OWN zero-noise trajectories, recorded once on CPU f64 and
committed under ``data/goldens/`` — they pin behavioral stability across
commits.  Their *correctness* (as opposed to stability) is covered by the
solver parity gates: KKT-residual sweeps on all four tracks
(tests/test_four_tracks.py) and scipy trust-constr agreement
(tests/test_ipm.py).

Regenerate CONSCIOUSLY after an intentional behavior change:

    python -m car_racing_tpu.utils.golden_fixtures
"""

from __future__ import annotations

import os

import numpy as np

GOLDEN_DIR = "data/goldens"


def _scenarios():
    import jax
    import jax.numpy as jnp

    from ..ops import dynamics, track as track_ops
    from ..racing import fused, policies, simulator, vehicles
    from . import params
    from .bench_fixtures import FIXTURE_PATH
    from .constants import X_DIM

    out = {}

    # ---- PID: host loop, 200 steps, l_shape width 0.8 -----------------------
    track = track_ops.load_track("l_shape", width=0.8)
    ego = vehicles.DynamicBicycleModel(name="ego", system_param=params.SystemParam.default())
    ego.set_zero_noise()
    ego.set_state_curvilinear(np.zeros(X_DIM))
    ego.set_state_global(np.zeros(X_DIM))
    ego.start_logging()
    sim = simulator.CarRacingSim()
    sim.set_timestep(0.1)
    sim.set_track(track)
    sim.add_vehicle(ego)
    pol = policies.PIDTracking(vt=0.8)
    pol.set_timestep(0.1)
    pol.set_track(track)
    pol.set_racing_sim(sim)
    ego.set_ctrl_policy(pol)
    sim.sim(sim_time=20.0)
    out["pid_l_shape"] = np.asarray(ego.xcurv_log)

    # ---- MPC-LTI: fused rollout, 100 steps ---------------------------------
    bike = dynamics.BicycleParams.default()
    mpc_param = params.MPCParam.default(vt=0.8)
    sysp = params.SystemParam.default()
    xt = jnp.asarray([0.8, 0, 0, 0, 0, 0.0])
    xc, us = fused.rollout_mpc_tracking(
        track, bike, mpc_param, sysp, xt, jnp.zeros(X_DIM), jnp.zeros(X_DIM), n_steps=100
    )
    out["mpc_lti_l_shape"] = np.asarray(xc)

    # ---- MPC-CBF: fused rollout vs two prescribed cars, 200 steps ----------
    track_w = track_ops.load_track("l_shape", width=1.0)
    cbf_param = params.MPCCBFParam.default(vt=0.8)
    n_obs = 4
    s_coef = np.zeros((n_obs, 2))
    ey_coef = np.zeros((n_obs, 2))
    act = np.zeros(n_obs, bool)
    s_coef[0], ey_coef[0], act[0] = [0.2, 4.0], [0.0, 0.1], True
    s_coef[1], ey_coef[1], act[1] = [0.2, 10.0], [0.0, -0.1], True
    halfs = np.ones((n_obs, 2))
    halfs[:2] = [0.2, 0.1]
    xc, us, kkt, _ = fused.rollout_mpccbf(
        track_w, bike, cbf_param, sysp, xt, jnp.zeros(X_DIM), jnp.zeros(X_DIM),
        jnp.asarray(s_coef), jnp.asarray(ey_coef), jnp.asarray(act),
        jnp.asarray(halfs), jnp.asarray([0.2, 0.1]), n_steps=200,
    )
    out["mpccbf_l_shape"] = np.asarray(xc)

    # ---- LMPC: fused learning lap from the committed seed fixture ----------
    seed = np.load(FIXTURE_PATH)
    lmpc_param = params.LMPCParam.default()
    j = lambda k: jnp.asarray(seed[k])
    xc, us, dones, lap_steps = fused.rollout_lmpc_lap(
        track_w, bike, lmpc_param, sysp, j("xcurv0"), j("xglob0"),
        j("ss1"), j("q1"), j("ss2"), j("q2"), j("u1"), j("u2"),
        jnp.asarray(seed["valid1"]), jnp.asarray(seed["valid2"]),
        jnp.asarray(seed["counter"], jnp.int32),
        j("lin_points0"), j("lin_input0"), n_steps=250,
    )
    out["lmpc_lap_l_shape"] = np.asarray(xc)[: int(lap_steps) + 1]

    # ---- iLQR: fused rollout on ellipse behind a slow blocking car ---------
    track_ell = track_ops.load_track("ellipse", width=1.0)
    ilqr_param = params.ILQRParam.default(vt=0.8)
    half = jnp.asarray([0.2, 0.1])
    xc, _, _ = fused.rollout_ilqr(
        track_ell, bike, ilqr_param, xt, jnp.zeros(X_DIM), jnp.zeros(X_DIM),
        jnp.asarray([0.2, 5.0]), jnp.asarray([0.0, 0.1]), half, half,
        n_steps=100, warm_start=False,  # the golden pins the reference's
        # cold-solve behavior (settles behind the car); the product default
        # is warm (policies.iLQRRacing / rollout_ilqr warm_start=True)
    )
    out["ilqr_ellipse"] = np.asarray(xc)

    # ---- racing game: fused overtake episode, the CI traffic pattern -------
    rg_param = params.RacingGameParam.default(alpha=0.8)
    opti = jnp.asarray(
        np.genfromtxt("data/optimal_traj/xcurv_l_shape.csv", delimiter=",")
    )
    s_coef = jnp.asarray([[0.72, 7.5], [0.7, 5.5]])  # sorted by ey desc
    ey_coef = jnp.asarray([[0.0, -0.2], [0.0, -0.5]])
    xc, us, ot, lap_steps = fused.rollout_racing_game(
        track_w, bike, lmpc_param, rg_param, sysp, j("xcurv0"), j("xglob0"),
        j("ss1"), j("q1"), j("ss2"), j("q2"), j("u1"), j("u2"),
        jnp.asarray(seed["valid1"]), jnp.asarray(seed["valid2"]),
        jnp.asarray(seed["counter"], jnp.int32),
        j("lin_points0"), j("lin_input0"), s_coef, ey_coef, opti, n_steps=300,
    )
    assert int(np.asarray(ot).sum()) > 0, "golden episode must contain overtakes"
    out["racing_game_l_shape"] = np.asarray(xc)[: int(lap_steps) + 1]

    # ---- goggle track: MPC-LTI + LMPC lap (non-l_shape coverage) -----------
    track_gog = track_ops.load_track("goggle", width=1.0)
    xc, _ = fused.rollout_mpc_tracking(
        track_gog, bike, mpc_param, sysp, xt, jnp.zeros(X_DIM), jnp.zeros(X_DIM),
        n_steps=150,
    )
    out["mpc_lti_goggle"] = np.asarray(xc)

    seed_g = np.load("data/bench/lmpc_seed_goggle.npz")
    jg = lambda k: jnp.asarray(seed_g[k])
    xc, us, dones, lap_steps = fused.rollout_lmpc_lap(
        track_gog, bike, lmpc_param, sysp, jg("xcurv0"), jg("xglob0"),
        jg("ss1"), jg("q1"), jg("ss2"), jg("q2"), jg("u1"), jg("u2"),
        jnp.asarray(seed_g["valid1"]), jnp.asarray(seed_g["valid2"]),
        jnp.asarray(seed_g["counter"], jnp.int32),
        jg("lin_points0"), jg("lin_input0"), n_steps=350,
    )
    assert 0 < int(lap_steps) < 350, "goggle LMPC lap must complete"
    out["lmpc_lap_goggle"] = np.asarray(xc)[: int(lap_steps) + 1]

    # ---- m_shape track: MPC-LTI + LMPC lap (the 4th stock layout,
    # previously exercised only by the KKT/closed-loop gates of
    # tests/test_four_tracks.py, never pinned — round-3 missing #3;
    # reference ships it first-class, data/track_layout/m_shape.csv) ------
    track_m = track_ops.load_track("m_shape", width=1.0)
    xc, _ = fused.rollout_mpc_tracking(
        track_m, bike, mpc_param, sysp, xt, jnp.zeros(X_DIM), jnp.zeros(X_DIM),
        n_steps=150,
    )
    out["mpc_lti_m_shape"] = np.asarray(xc)

    seed_m = np.load("data/bench/lmpc_seed_m_shape.npz")
    jm = lambda k: jnp.asarray(seed_m[k])
    xc, us, dones, lap_steps = fused.rollout_lmpc_lap(
        track_m, bike, lmpc_param, sysp, jm("xcurv0"), jm("xglob0"),
        jm("ss1"), jm("q1"), jm("ss2"), jm("q2"), jm("u1"), jm("u2"),
        jnp.asarray(seed_m["valid1"]), jnp.asarray(seed_m["valid2"]),
        jnp.asarray(seed_m["counter"], jnp.int32),
        jm("lin_points0"), jm("lin_input0"), n_steps=700,
    )
    assert 0 < int(lap_steps) < 700, "m_shape LMPC lap must complete"
    out["lmpc_lap_m_shape"] = np.asarray(xc)[: int(lap_steps) + 1]

    # racing-game overtake episode on m_shape (traffic placed for a clean
    # pass — the l_shape traffic offsets put the catch-up mid-corner on
    # this layout and the tracker grazes car1; min superellipse barrier
    # for this config is 29/679 per car vs the >1 safe threshold)
    opti_m = jnp.asarray(
        np.genfromtxt("data/optimal_traj/xcurv_m_shape.csv", delimiter=",")
    )
    xc, us, ot, lap_steps = fused.rollout_racing_game(
        track_m, bike, lmpc_param, rg_param, sysp, jm("xcurv0"), jm("xglob0"),
        jm("ss1"), jm("q1"), jm("ss2"), jm("q2"), jm("u1"), jm("u2"),
        jnp.asarray(seed_m["valid1"]), jnp.asarray(seed_m["valid2"]),
        jnp.asarray(seed_m["counter"], jnp.int32),
        jm("lin_points0"), jm("lin_input0"),
        jnp.asarray([[0.5, 10.0], [0.48, 6.5]]),
        jnp.asarray([[0.0, -0.3], [0.0, -0.55]]),
        opti_m, n_steps=700,
    )
    assert int(np.asarray(ot).sum()) > 0, "m_shape episode must overtake"
    assert 0 < int(lap_steps) < 700
    out["racing_game_m_shape"] = np.asarray(xc)[: int(lap_steps) + 1]

    # ---- ellipse LMPC lap: with this, every stock layout has a pinned
    # learned lap (l_shape, goggle, m_shape, ellipse) -------------------
    seed_e = np.load("data/bench/lmpc_seed_ellipse.npz")
    je = lambda k: jnp.asarray(seed_e[k])
    xc, us, dones, lap_steps = fused.rollout_lmpc_lap(
        track_ell, bike, lmpc_param, sysp, je("xcurv0"), je("xglob0"),
        je("ss1"), je("q1"), je("ss2"), je("q2"), je("u1"), je("u2"),
        jnp.asarray(seed_e["valid1"]), jnp.asarray(seed_e["valid2"]),
        jnp.asarray(seed_e["counter"], jnp.int32),
        je("lin_points0"), je("lin_input0"), n_steps=400,
    )
    assert 0 < int(lap_steps) < 400, "ellipse LMPC lap must complete"
    out["lmpc_lap_ellipse"] = np.asarray(xc)[: int(lap_steps) + 1]
    return out


def generate(golden_dir: str = GOLDEN_DIR):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    os.makedirs(golden_dir, exist_ok=True)
    for name, traj in _scenarios().items():
        path = os.path.join(golden_dir, f"{name}.csv")
        np.savetxt(path, traj, delimiter=",")
        print(f"wrote {path}: {traj.shape}")


if __name__ == "__main__":
    generate()
