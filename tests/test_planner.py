"""Unit tests for the overtake planners: Bezier corridors, vmapped branch
QPs, branch selection, and the distributed sweep on the 8-device mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

from car_racing_tpu.ops import bezier, track as track_ops
from car_racing_tpu.planning import overtake
from car_racing_tpu.racing import vehicles
from car_racing_tpu.utils import params
from car_racing_tpu.utils.constants import X_DIM


@pytest.fixture(scope="module")
def track():
    spec = np.genfromtxt("data/track_layout/l_shape.csv", delimiter=",")
    return track_ops.build_track(spec, width=1.0)


def test_bezier_curve_endpoints():
    cp = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [2.0, 1.0], [3.0, 0.0]])
    pts = np.asarray(bezier.bezier_curve(cp, jnp.asarray([0.0, 0.5, 1.0])))
    np.testing.assert_allclose(pts[0], [0.0, 0.0])
    np.testing.assert_allclose(pts[-1], [3.0, 0.0])
    assert pts[1, 1] > 0.5  # bulges toward the control points


def test_corridor_control_points_span(track):
    opt = np.genfromtxt("data/optimal_traj/xcurv_l_shape.csv", delimiter=",")
    xcurv = jnp.asarray([0.8, 0, 0, 0, 5.0, 0.1])
    veh_info = jnp.asarray([[6.0, 0.2, 0.1], [7.0, -0.2, -0.3]])  # sorted by ey desc
    cp = bezier.corridor_control_points(
        2, xcurv, veh_info, jnp.asarray(0.3), track.lap_length, track.width,
        jnp.asarray(0.2), jnp.asarray(opt), jnp.asarray(0.5),
    )
    cp = np.asarray(cp)
    assert cp.shape == (3, 4, 2)
    # all corridors start at the ego position
    np.testing.assert_allclose(cp[:, 0, 0], 5.0)
    np.testing.assert_allclose(cp[:, 0, 1], 0.1)
    # corridor 0 passes left (high ey), corridor 2 right (low ey)
    assert cp[0, 1, 1] > cp[1, 1, 1] > cp[2, 1, 1]


def _planner_setup(track):
    param = params.RacingGameParam.default(alpha=0.8)
    planner = overtake.OvertakeTrajPlanner(param)
    planner.track = track
    planner.agent_name = "ego"
    planner.opti_traj_xcurv = np.genfromtxt("data/optimal_traj/xcurv_l_shape.csv", delimiter=",")

    ego = vehicles.DynamicBicycleModel(name="ego", system_param=params.SystemParam.default())
    ego.set_track(track)
    ego.set_timestep(0.1)
    ego.set_state_curvilinear(np.array([0.8, 0, 0, 0, 5.0, 0.0]))
    ego.set_state_global(np.zeros(X_DIM))
    vehs = {"ego": ego}
    for i, (s0, ey0) in enumerate([(6.0, 0.15), (6.5, -0.25)]):
        car = vehicles.NoDynamicsModel(name=f"car{i+1}")
        car.set_track(track)
        car.set_timestep(0.1)
        car.set_state_curvilinear_func([0.2, s0], [0.0, ey0])
        vehs[f"car{i+1}"] = car
    planner.vehicles = vehs
    return planner, ego, vehs


def test_overtake_flag_triggers_near_traffic(track):
    planner, ego, vehs = _planner_setup(track)
    flag, interest = planner.get_overtake_flag(ego.xcurv)
    assert flag
    assert set(interest) == {"car1", "car2"}
    # far-away traffic does not trigger
    ego.set_state_curvilinear(np.array([0.8, 0, 0, 0, 15.0, 0.0]))
    flag, interest = planner.get_overtake_flag(ego.xcurv)
    assert not flag


def test_get_local_traj_branches(track):
    planner, ego, vehs = _planner_setup(track)
    interest = {"car1": vehs["car1"], "car2": vehs["car2"]}
    (traj, traj_glob, direction, sorted_vehicles, bez, st, all_bez, all_traj) = (
        planner.get_local_traj(ego.xcurv, 0.0, interest)
    )
    assert traj.shape[1] == X_DIM
    assert sorted_vehicles == ["car1", "car2"]  # sorted by ey descending
    assert 0 <= direction <= 2
    assert all_traj.shape[0] == 3  # num_veh + 1 corridors
    # real per-branch Newton-iteration counts recorded (never a fill)
    iters = planner.last_branch_iterations
    assert iters is not None and iters.shape == (3,) and (iters > 0).all()
    # progress: the chosen trajectory moves forward
    assert traj[-1, 4] > traj[0, 4] + 0.2
    # planner trajectory starts at the ego state
    np.testing.assert_allclose(traj[0, :], ego.xcurv, atol=1e-6)
    # direction-switch hysteresis: with old flag set, selection sticks
    (_, _, d2, _, _, _, _, _) = planner.get_local_traj(
        ego.xcurv, 0.0, interest, old_direction_flag=direction
    )
    assert d2 == direction


def test_get_local_traj_mesh_dispatch_matches_single_chip(track):
    """The planner's opt-in mesh dispatch (corridor QPs + fallback +
    selection sharded over the devices' branch axis) must return the SAME
    plan as the single-chip path on identical inputs."""
    from car_racing_tpu.parallel import mesh as mesh_mod

    planner_host, ego, vehs = _planner_setup(track)
    planner_mesh, _, _ = _planner_setup(track)
    planner_mesh.mesh = mesh_mod.make_branch_mesh(8)
    planner_mesh.vehicles = vehs  # identical world
    interest = {"car1": vehs["car1"], "car2": vehs["car2"]}

    (traj_h, glob_h, dir_h, sv_h, _, _, _, all_h) = planner_host.get_local_traj(
        ego.xcurv, 0.0, interest
    )
    (traj_m, glob_m, dir_m, sv_m, _, _, _, all_m) = planner_mesh.get_local_traj(
        ego.xcurv, 0.0, interest
    )
    assert dir_m == dir_h
    assert sv_m == sv_h
    np.testing.assert_allclose(traj_m, traj_h, atol=1e-4)
    np.testing.assert_allclose(all_m, all_h, atol=1e-4)
    np.testing.assert_allclose(glob_m, glob_h, atol=1e-4)
    # observability parity: the mesh path surfaces the same REAL per-branch
    # Newton counts the host path records (round-3 weak #5: it used to
    # reset them to None)
    it_h = np.asarray(planner_host.last_branch_iterations)
    it_m = np.asarray(planner_mesh.last_branch_iterations)
    assert it_m.shape == it_h.shape
    np.testing.assert_array_equal(it_m, it_h)
    assert it_m.min() >= 1
    # hysteresis works through the mesh path too
    (_, _, d2, _, _, _, _, _) = planner_mesh.get_local_traj(
        ego.xcurv, 0.0, interest, old_direction_flag=dir_m
    )
    assert d2 == dir_m
    # rejects a mesh with a scenario axis (the dispatch is branch-only)
    with pytest.raises(ValueError):
        overtake.OvertakeTrajPlanner(
            params.RacingGameParam.default(alpha=0.8), mesh=mesh_mod.make_mesh(8)
        )
    # the racing-game policy plumbs its mesh through to the planner
    from car_racing_tpu.racing import policies

    pol = policies.LMPCRacingGame(
        params.LMPCParam.default(),
        racing_game_param=params.RacingGameParam.default(alpha=0.8),
        system_param=params.SystemParam.default(),
        timestep=0.1, lap_number=4, time_lmpc=100.0,
        mesh=planner_mesh.mesh,
    )
    assert pol.overtake_planner.mesh is planner_mesh.mesh


def test_path_planner_branches(track):
    param = params.RacingGameParam.default(alpha=0.8)
    planner = overtake.OvertakePathPlanner(param)
    planner.track = track
    planner.agent_name = "ego"
    planner.opti_traj_xcurv = np.genfromtxt("data/optimal_traj/xcurv_l_shape.csv", delimiter=",")
    pl2, ego, vehs = _planner_setup(track)
    planner.vehicles = vehs
    interest = {"car1": vehs["car1"], "car2": vehs["car2"]}
    (traj, traj_glob, direction, sorted_vehicles, bez, st, all_bez, all_traj) = (
        planner.get_local_path(ego.xcurv, 0.0, interest)
    )
    assert traj.shape[1] == X_DIM
    assert traj[-1, 4] > traj[0, 4]
    # speed profile attached to stages 0..N-1 (the reference leaves the
    # final stage's vx unset, overtake_path_planner.py:178-181)
    assert (traj[:-1, 0] > 0).all()
