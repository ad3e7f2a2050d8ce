"""Dynamics unit tests: single step vs a hand-rolled numpy oracle of the
reference math (vehicle_dynamics.py:4-49), substep propagation, noise
clipping, and autodiff linearization vs finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from car_racing_tpu.ops import dynamics, track as track_ops


@pytest.fixture(scope="module")
def track():
    spec = np.genfromtxt("data/track_layout/l_shape.csv", delimiter=",")
    return track_ops.build_track(spec, width=0.8)


def numpy_reference_step(params, curv, xglob, xcurv, dt, u):
    """Independent numpy oracle of the reference's Euler step."""
    m, lf, lr, Iz = params.m, params.lf, params.lr, params.Iz
    Df, Cf, Bf, Dr, Cr, Br = params.Df, params.Cf, params.Bf, params.Dr, params.Cr, params.Br
    delta, a = u
    vx, vy, wz, epsi, s, ey = xcurv
    psi, X, Y = xglob[3], xglob[4], xglob[5]
    alpha_f = delta - np.arctan2(vy + lf * wz, vx)
    alpha_r = -np.arctan2(vy - lr * wz, vx)
    Fyf = 2 * Df * np.sin(Cf * np.arctan(Bf * alpha_f))
    Fyr = 2 * Dr * np.sin(Cr * np.arctan(Br * alpha_r))
    xc = np.array(
        [
            vx + dt * (a - Fyf * np.sin(delta) / m + wz * vy),
            vy + dt * ((Fyf * np.cos(delta) + Fyr) / m - wz * vx),
            wz + dt * ((lf * Fyf * np.cos(delta) - lr * Fyr) / Iz),
            epsi + dt * (wz - (vx * np.cos(epsi) - vy * np.sin(epsi)) / (1 - curv * ey) * curv),
            s + dt * ((vx * np.cos(epsi) - vy * np.sin(epsi)) / (1 - curv * ey)),
            ey + dt * (vx * np.sin(epsi) + vy * np.cos(epsi)),
        ]
    )
    xg = np.array(
        [
            xc[0],
            xc[1],
            xc[2],
            psi + dt * wz,
            X + dt * (vx * np.cos(psi) - vy * np.sin(psi)),
            Y + dt * (vx * np.sin(psi) + vy * np.cos(psi)),
        ]
    )
    return xg, xc


def test_step_matches_oracle():
    p = dynamics.BicycleParams.default()
    xcurv = jnp.asarray([1.2, 0.05, 0.3, 0.1, 4.0, -0.1])
    xglob = jnp.asarray([1.2, 0.05, 0.3, 0.7, 1.0, 2.0])
    u = jnp.asarray([0.1, 0.5])
    xg, xc = dynamics.step(p, jnp.asarray(0.5), xglob, xcurv, jnp.asarray(0.001), u)
    xg_ref, xc_ref = numpy_reference_step(p, 0.5, np.asarray(xglob), np.asarray(xcurv), 0.001, np.asarray(u))
    np.testing.assert_allclose(np.asarray(xc), xc_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(xg), xg_ref, rtol=1e-12)


def test_propagate_substeps(track):
    """100 x 1ms substeps advance s by ~ vx * 0.1 on a straight."""
    p = dynamics.BicycleParams.default()
    xcurv = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.5, 0.0])
    xglob = track_ops.frenet_to_global_state(track, xcurv)
    u = jnp.asarray([0.0, 0.0])
    xg, xc = dynamics.propagate(track, p, xglob, xcurv, u)
    assert float(xc[4]) == pytest.approx(0.6, abs=1e-6)
    assert float(xc[0]) == pytest.approx(1.0, abs=1e-9)


def test_propagate_unroll_equivalent(track):
    """The substep-scan unroll knob (throughput paths use 10) is physically
    equivalent to the default sequential scan: same math, only XLA loop
    structure — any drift over 50 control periods must stay at fp-noise
    level, far below model/process-noise scales."""
    p = dynamics.BicycleParams.default()
    xcurv = jnp.asarray([0.8, 0.01, 0.02, 0.03, 0.5, 0.05])
    xglob = track_ops.frenet_to_global_state(track, xcurv)
    u = jnp.asarray([0.05, 0.2])
    a = (xglob, xcurv)
    b = (xglob, xcurv)
    for _ in range(50):
        a = dynamics.propagate(track, p, a[0], a[1], u)
        b = dynamics.propagate(track, p, b[0], b[1], u, unroll=10)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-9, atol=1e-9)


def test_propagate_consistency_frenet_global(track):
    """After propagation, xglob must equal the Frenet->global image of xcurv."""
    p = dynamics.BicycleParams.default()
    xcurv = jnp.asarray([0.8, 0.0, 0.0, 0.0, 0.2, 0.05])
    xglob = track_ops.frenet_to_global_state(track, xcurv)
    u = jnp.asarray([0.05, 0.3])
    for _ in range(30):
        xglob, xcurv = dynamics.propagate(track, p, xglob, xcurv, u)
        u = jnp.asarray([0.02, 0.1])
    xglob_from_curv = track_ops.frenet_to_global_state(track, xcurv)
    np.testing.assert_allclose(
        np.asarray(xglob[4:]), np.asarray(xglob_from_curv[4:]), atol=5e-2
    )


def test_noise_clipping():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros(6)
    samples = jax.vmap(lambda k: dynamics.process_noise(k, x))(jax.random.split(key, 1000))
    s = np.asarray(samples)
    assert np.abs(s[:, 0]).max() <= 0.5 * 0.05 + 1e-12
    assert np.abs(s[:, 1]).max() <= 0.5 * 0.1 + 1e-12
    assert np.abs(s[:, 2]).max() <= 0.5 * 0.05 + 1e-12
    assert np.all(s[:, 3:] == 0)


def test_linearize_matches_fd(track):
    p = dynamics.BicycleParams.default()
    xcurv = jnp.asarray([1.1, 0.02, 0.1, 0.05, 2.0, -0.1])
    u = jnp.asarray([0.1, 0.4])
    dt = jnp.asarray(0.1)
    A, B, C = dynamics.linearize(track, p, xcurv, u, dt)
    f = lambda x, uu: dynamics.curv_step(track, p, x, uu, dt)
    eps = 1e-6
    for j in range(6):
        dx = np.zeros(6)
        dx[j] = eps
        fd = (np.asarray(f(xcurv + dx, u)) - np.asarray(f(xcurv - dx, u))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(A)[:, j], fd, atol=1e-5)
    # affine consistency: f(x, u) == A x + B u + C
    np.testing.assert_allclose(
        np.asarray(f(xcurv, u)),
        np.asarray(A @ xcurv + B @ u + C),
        rtol=1e-10,
        atol=1e-10,
    )


def test_const_velocity_prediction(track):
    xcurv = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.1])
    xglob = track_ops.frenet_to_global_state(track, xcurv)
    xc_traj, xg_traj = dynamics.const_velocity_prediction(track, xcurv, xglob, 0.1, 11)
    assert xc_traj.shape == (11, 6)
    # s advances monotonically (modulo wrap) with frozen velocity
    assert float(xc_traj[1, 4]) > float(xc_traj[0, 4])
    np.testing.assert_allclose(np.asarray(xc_traj[:, 0]), 1.0)
