"""System identification: ridge-regression LTI fit from logged laps.

Rebuild of the reference (car_racing/system/system_identification.py:4-43):
fit x_{k+1} = A x_k + B u_k by regularized least squares on simulation
logs, and write data/sys/LTI/matrix_{A,B}.csv.  The normal-equation solve
runs in JAX (device-batched when fitting per-lap models).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.constants import U_DIM, X_DIM


def linear_regression(x: np.ndarray, u: np.ndarray, lamb: float):
    """Estimate (A, B) with Tikhonov regularization (reference :4-26).

    x: (T, X_DIM) states; u: (T, U_DIM) inputs; lamb: ridge coefficient.
    Returns (A, B, error) with error rows = (max, min) residual per channel.
    """
    x = jnp.asarray(x)
    u = jnp.asarray(u)
    Y = x[2:]
    X = jnp.concatenate([x[1:-1], u[1:-1]], axis=1)
    W = jnp.linalg.solve(X.T @ X + lamb * jnp.eye(X.shape[1], dtype=x.dtype), X.T @ Y)
    A = np.asarray(W.T[:, :X_DIM])
    B = np.asarray(W.T[:, X_DIM : X_DIM + U_DIM])
    residual = np.asarray(X @ W - Y)
    error = np.vstack([residual.max(axis=0), residual.min(axis=0)])
    return A, B, error


def get_xdata(ego) -> np.ndarray:
    """Stack all logged states (flat across laps)."""
    return np.asarray(ego.xcurv_log)


def get_udata(ego) -> np.ndarray:
    """Stack all logged inputs lap by lap (reference :28-43)."""
    rows = []
    for lap in ego.inputs:
        rows.extend(lap)
    rows.extend(ego.lap_inputs)
    return np.asarray(rows)


def save_lti(A: np.ndarray, B: np.ndarray, data_dir: str = "data"):
    np.savetxt(f"{data_dir}/sys/LTI/matrix_A.csv", A, delimiter=",")
    np.savetxt(f"{data_dir}/sys/LTI/matrix_B.csv", B, delimiter=",")
