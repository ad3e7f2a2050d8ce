"""Pallas kernel correctness (interpret mode on CPU) vs jnp.linalg."""

import numpy as np
import jax.numpy as jnp
import pytest

from car_racing_tpu.ops import pallas_kernels


@pytest.mark.parametrize("n,B", [(8, 16), (24, 64)])
def test_cholesky_solve_matches_linalg(n, B):
    rng = np.random.default_rng(0)
    L = rng.normal(size=(B, n, n))
    A = L @ np.transpose(L, (0, 2, 1)) + n * np.eye(n)
    b = rng.normal(size=(B, n))
    x = pallas_kernels.cholesky_solve_batched(
        jnp.asarray(A), jnp.asarray(b), interpret=True
    )
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-8)


def test_solve_batched_fallback_cpu():
    rng = np.random.default_rng(1)
    n, B = 12, 8
    L = rng.normal(size=(B, n, n))
    A = L @ np.transpose(L, (0, 2, 1)) + n * np.eye(n)
    b = rng.normal(size=(B, n))
    x = pallas_kernels.solve_batched(jnp.asarray(A), jnp.asarray(b))
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("n,r,B", [(12, 4, 16), (24, 8, 32)])
def test_multi_rhs_matches_linalg(n, r, B):
    rng = np.random.default_rng(2)
    L = rng.normal(size=(B, n, n))
    A = L @ np.transpose(L, (0, 2, 1)) + n * np.eye(n)
    Brhs = rng.normal(size=(B, n, r))
    x = pallas_kernels.cholesky_solve_multi_batched(
        jnp.asarray(A), jnp.asarray(Brhs), interpret=True
    )
    x_ref = np.linalg.solve(A, Brhs)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-8)


def test_batch_padding_path():
    """Batch sizes that don't divide the lane block are zero-padded."""
    rng = np.random.default_rng(3)
    n, B = 8, 130  # pads to 256 with blk=max(128,130)->130? exercise pad logic
    L = rng.normal(size=(B, n, n))
    A = L @ np.transpose(L, (0, 2, 1)) + n * np.eye(n)
    b = rng.normal(size=(B, n))
    x = pallas_kernels.cholesky_solve_batched(jnp.asarray(A), jnp.asarray(b), interpret=True)
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-8)


def test_propagate_fused_matches_scan():
    """The fused Pallas control-period integrator (interpret mode on CPU)
    must track the lax.scan reference to ~1e-6 (this kernel is what
    dynamics.propagate(backend="auto") ships ON TPU since r4; the
    non-interpret on-device gate is tests/test_tpu_native.py, executed by
    the bench harness on real silicon)."""
    import numpy as np
    import jax

    from car_racing_tpu.ops import dynamics, pallas_kernels, track as track_ops

    f32 = jnp.float32
    cast = lambda t: jax.tree.map(lambda a: jnp.asarray(a, f32), t)
    track = cast(track_ops.load_track("l_shape", width=1.0))
    bike = cast(dynamics.BicycleParams.default())
    rng = np.random.default_rng(0)
    for _ in range(5):
        xc = jnp.asarray(
            np.array([0.8, 0.01, 0.02, 0.01, 5.0, 0.05])
            + 0.3 * rng.standard_normal(6) * np.array([1, 0.1, 0.1, 0.1, 10, 1]),
            f32,
        )
        xg = jnp.asarray(rng.standard_normal(6), f32)
        u = jnp.asarray([0.05, 0.3] + 0.1 * rng.standard_normal(2), f32)
        xg1, xc1 = dynamics.propagate(track, bike, xg, xc, u)
        xg2, xc2 = pallas_kernels.propagate_fused(
            track, bike, xg, xc, u, interpret=True
        )
        np.testing.assert_allclose(np.asarray(xc2), np.asarray(xc1), atol=2e-6)
        np.testing.assert_allclose(np.asarray(xg2), np.asarray(xg1), atol=2e-6)
    # the dispatch flag routes to the same kernel (compiled path is
    # TPU-only; interpret keeps this testable on the CPU mesh)


def test_propagate_fused_negative_vx_matches_scan():
    """The in-kernel atan2 carries the x<0 quadrant correction (ADVICE r4:
    the old atan(y/max(vx,eps)) silently saturated at +-pi/2 for vx<0):
    hard-braking / perturbed standing starts with NEGATIVE vx must track
    the scan path's jnp.arctan2 dynamics, not diverge qualitatively."""
    import jax

    from car_racing_tpu.ops import dynamics, pallas_kernels, track as track_ops

    f32 = jnp.float32
    cast = lambda t: jax.tree.map(lambda a: jnp.asarray(a, f32), t)
    track = cast(track_ops.load_track("l_shape", width=1.0))
    bike = cast(dynamics.BicycleParams.default())
    rng = np.random.default_rng(7)
    for _ in range(4):
        xc = jnp.asarray(
            np.array([-0.15, 0.02, 0.05, 0.01, 3.0, 0.05])
            + rng.standard_normal(6) * np.array([0.1, 0.02, 0.05, 0.05, 2.0, 0.1]),
            f32,
        )
        assert float(xc[0]) < 0.0  # the branch under test
        xg = jnp.asarray(rng.standard_normal(6), f32)
        u = jnp.asarray([0.02, -0.5], f32)  # braking
        # short period: backward-rolling dynamics are unstable, so compare
        # before the trajectories exponentially separate from f32 noise
        xg1, xc1 = dynamics.propagate(
            track, bike, xg, xc, u, control_dt=0.02, backend="scan"
        )
        xg2, xc2 = pallas_kernels.propagate_fused(
            track, bike, xg, xc, u, control_dt=0.02, interpret=True
        )
        np.testing.assert_allclose(np.asarray(xc2), np.asarray(xc1), atol=5e-5)
        np.testing.assert_allclose(np.asarray(xg2), np.asarray(xg1), atol=5e-5)
