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
