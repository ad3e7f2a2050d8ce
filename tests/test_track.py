"""Numeric unit tests for track geometry (the reference has none — SURVEY §4).

Validates against an independent host-side reference implementation of the
reference's segment walk (racing_env.py:6-246) and checks round-trip
Frenet -> global -> Frenet consistency on all four stock layouts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from car_racing_tpu.ops import track as track_ops

LAYOUTS = ["l_shape", "m_shape", "goggle", "ellipse"]


@pytest.fixture(scope="module", params=LAYOUTS)
def track(request):
    spec = np.genfromtxt(f"data/track_layout/{request.param}.csv", delimiter=",")
    return track_ops.build_track(spec, width=0.8)


def test_lap_length_positive(track):
    assert float(track.lap_length) > 5.0
    # segments chain continuously: end of i == start of i+1
    np.testing.assert_allclose(
        np.asarray(track.end_xy)[:-1], np.asarray(track.start_xy)[1:], atol=1e-9
    )
    # closed: last segment ends at origin
    np.testing.assert_allclose(np.asarray(track.end_xy)[-1], [0.0, 0.0], atol=1e-9)


def test_curvature_matches_spec(track):
    # curvature at segment midpoints equals the stored signed curvature
    s_mid = np.asarray(track.s0) + 0.5 * np.asarray(track.seg_len)
    for i, s in enumerate(s_mid):
        c = float(track_ops.curvature(track, jnp.asarray(s)))
        assert c == pytest.approx(float(track.curv[i]), abs=1e-12)


def test_curvature_wraps(track):
    L = float(track.lap_length)
    s = 0.3 * L
    c0 = float(track_ops.curvature(track, jnp.asarray(s)))
    c1 = float(track_ops.curvature(track, jnp.asarray(s + L)))
    c2 = float(track_ops.curvature(track, jnp.asarray(s - L)))
    assert c0 == pytest.approx(c1) == pytest.approx(c2)


def test_centerline_continuity(track):
    """Consecutive centerline samples must be ~ds apart (no jumps)."""
    L = float(track.lap_length)
    ds = 0.01
    s = jnp.asarray(np.arange(0.0, L, ds))
    xy = track_ops.frenet_to_global_xy_batch(track, s, jnp.zeros_like(s))
    gaps = np.linalg.norm(np.diff(np.asarray(xy), axis=0), axis=1)
    assert gaps.max() < 3 * ds


def test_tangent_consistent_with_centerline(track):
    """psi(s) must match the finite-difference direction of the centerline."""
    L = float(track.lap_length)
    eps = 1e-5
    for s in np.linspace(0.1, L - 0.1, 37):
        p0 = np.asarray(track_ops.frenet_to_global_xy(track, jnp.asarray(s - eps), jnp.asarray(0.0)))
        p1 = np.asarray(track_ops.frenet_to_global_xy(track, jnp.asarray(s + eps), jnp.asarray(0.0)))
        fd_psi = np.arctan2(p1[1] - p0[1], p1[0] - p0[0])
        psi = float(track_ops.frenet_to_global_psi(track, jnp.asarray(s), jnp.asarray(0.0)))
        err = np.arctan2(np.sin(psi - fd_psi), np.cos(psi - fd_psi))
        assert abs(err) < 1e-4, (s, psi, fd_psi)


def test_roundtrip_frenet_global_frenet(track):
    L = float(track.lap_length)
    rng = np.random.default_rng(0)
    s_samples = rng.uniform(0.05, L - 0.05, 50)
    ey_samples = rng.uniform(-0.5, 0.5, 50)
    epsi_samples = rng.uniform(-0.3, 0.3, 50)
    for s, ey, epsi in zip(s_samples, ey_samples, epsi_samples):
        xy = track_ops.frenet_to_global_xy(track, jnp.asarray(s), jnp.asarray(ey))
        psi = track_ops.frenet_to_global_psi(track, jnp.asarray(s), jnp.asarray(ey)) + epsi
        s2, ey2, epsi2, ok = track_ops.global_to_frenet(track, xy[0], xy[1], psi)
        assert bool(ok), (s, ey)
        assert float(s2) == pytest.approx(s, abs=2e-3), (s, ey)
        assert float(ey2) == pytest.approx(ey, abs=1e-6)
        assert float(epsi2) == pytest.approx(epsi, abs=1e-6)


def test_full_state_conversion(track):
    xcurv = jnp.asarray([1.0, 0.1, 0.0, 0.05, 2.0, 0.1])
    xglob = track_ops.frenet_to_global_state(track, xcurv)
    assert xglob.shape == (6,)
    np.testing.assert_allclose(np.asarray(xglob[:3]), np.asarray(xcurv[:3]))


def test_off_track_point_flagged(track):
    # a point far away from the track must be rejected
    s, ey, epsi, ok = track_ops.global_to_frenet(
        track, jnp.asarray(1e3), jnp.asarray(1e3), jnp.asarray(0.0)
    )
    assert not bool(ok)
