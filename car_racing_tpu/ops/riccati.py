"""Riccati recursions: the horizon-structured KKT kernels.

The KKT system of a horizon-N linear-quadratic OCP is block-tridiagonal in
the stage index; its LDL' factorization *is* the discrete Riccati recursion.
These kernels provide:

- :func:`dare_iterate` — the fixed-point discrete algebraic Riccati iteration
  used by the LQR tracking controller (reference control/control.py:39-53),
  as a ``lax.scan`` with convergence freezing.
- :func:`tvlqr_backward` / :func:`tvlqr_rollout` — time-varying LQR backward
  pass and affine rollout; the backbone of the iLQR controller
  (control.py:111-191) and of Riccati-structured KKT solves.

All functions are jittable and vmap cleanly over batches (branches,
scenarios, vehicles).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_iter",))
def dare_iterate(A, B, Q, R, max_iter: int = 50, eps: float = 1e-2):
    """Iterate P <- A'PA - A'PB (R + B'PB)^-1 B'PA + Q from P0 = Q.

    Matches the reference's fixed-point loop (control.py:43-53): stops
    updating once max |P_next - P| < eps, runs a fixed max_iter schedule.
    Returns (P, K) with K = (R + B'PB)^-1 B'PA.
    """

    def body(carry, _):
        P, done = carry
        BtP = B.T @ P
        K = jnp.linalg.solve(R + BtP @ B, BtP @ A)
        P_next = A.T @ P @ A - (A.T @ P @ B) @ K + Q
        done_next = done | (jnp.max(jnp.abs(P_next - P)) < eps)
        P = jnp.where(done, P, P_next)
        return (P, done_next), None

    (P, _), _ = jax.lax.scan(body, (Q, jnp.asarray(False)), None, length=max_iter)
    BtP = B.T @ P
    K = jnp.linalg.solve(R + BtP @ B, BtP @ A)
    return P, K


def sym2x2_clamped_inv(M, reg):
    """Inverse of a symmetric 2x2 matrix with eigenvalues clamped to
    ``max(w, 0) + reg`` — closed form via the rotation angle.

    For ``M = [[a, b], [b, c]]`` the eigenpairs are ``m ± r`` with
    ``m = (a+c)/2``, ``r = hypot((a-c)/2, b)`` and eigenvector angle
    ``theta = atan2(2b, a-c)/2`` (smooth at b = 0).  On TPU this replaces
    ``jnp.linalg.eigh`` — whose QR-iteration lowering dominated both compile
    time (~250 s for the iLQR nested scans) and runtime — with a handful of
    fused VPU ops."""
    a, b, c = M[0, 0], 0.5 * (M[0, 1] + M[1, 0]), M[1, 1]
    m = 0.5 * (a + c)
    r = jnp.hypot(0.5 * (a - c), b)
    theta = 0.5 * jnp.arctan2(2.0 * b, a - c)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    w_hi = jnp.maximum(m + r, 0.0) + reg  # eigvec [ct, st]
    w_lo = jnp.maximum(m - r, 0.0) + reg  # eigvec [-st, ct]
    i_hi, i_lo = 1.0 / w_hi, 1.0 / w_lo
    return jnp.array(
        [
            [i_hi * ct * ct + i_lo * st * st, (i_hi - i_lo) * ct * st],
            [(i_hi - i_lo) * ct * st, i_hi * st * st + i_lo * ct * ct],
        ],
        dtype=M.dtype,
    )


def _clamped_inv(M, reg):
    """Eigenvalue-clamped inverse: closed form for 2x2, eigh otherwise."""
    if M.shape == (2, 2):
        return sym2x2_clamped_inv(M, reg)
    w, V = jnp.linalg.eigh(0.5 * (M + M.T))
    w = jnp.maximum(w, 0.0) + reg
    return (V * (1.0 / w)) @ V.T


def tvlqr_backward(f_x, f_u, l_x, l_u, l_xx, l_uu, Vx_T, Vxx_T, reg: jax.Array):
    """TV-LQR backward pass over a horizon (one ``lax.scan``).

    Args (all stage-stacked, length N on the leading axis unless noted):
      f_x: (N, n, n) dynamics state Jacobians
      f_u: (N, n, m) dynamics input Jacobians
      l_x, l_u: (N, n), (N, m) cost gradients
      l_xx, l_uu: (N, n, n), (N, m, m) cost Hessians
      Vx_T, Vxx_T: terminal value gradient/Hessian
      reg: Levenberg regularization added to Quu's clamped eigenvalues
           (reference control.py:155-158).

    Returns (k, K): feedforward (N, m) and feedback (N, m, n) gains.
    """

    def body(carry, inp):
        Vx, Vxx = carry
        fx, fu, lx, lu, lxx, luu = inp
        Qx = lx + fx.T @ Vx
        Qu = lu + fu.T @ Vx
        Qxx = lxx + fx.T @ Vxx @ fx
        Quu = luu + fu.T @ Vxx @ fu
        Qux = fu.T @ Vxx @ fx
        # eigenvalue-clamped regularized inverse (control.py:155-158)
        Quu_inv = _clamped_inv(0.5 * (Quu + Quu.T), reg)
        k = -Quu_inv @ Qu
        K = -Quu_inv @ Qux
        Vx_new = Qx - K.T @ Quu @ k
        Vxx_new = Qxx - K.T @ Quu @ K
        return (Vx_new, Vxx_new), (k, K)

    (_, _), (ks, Ks) = jax.lax.scan(
        body, (Vx_T, Vxx_T), (f_x, f_u, l_x, l_u, l_xx, l_uu), reverse=True
    )
    return ks, Ks


def tvlqr_rollout(A, B, x0, u_ref, x_ref, ks, Ks):
    """Affine rollout u = u_ref + k + K (x - x_ref) through x+ = Ax + Bu.

    A, B may be (n, n)/(n, m) LTI or (N, ...) stacked TV.
    Returns (xs (N+1, n), us (N, m)).
    """
    N = ks.shape[0]
    if A.ndim == 2:
        A = jnp.broadcast_to(A, (N,) + A.shape)
        B = jnp.broadcast_to(B, (N,) + B.shape)

    def body(x, inp):
        Ak, Bk, uk_ref, xk_ref, k, K = inp
        u = uk_ref + k + K @ (x - xk_ref)
        x_next = Ak @ x + Bk @ u
        return x_next, (x, u)

    xT, (xs, us) = jax.lax.scan(body, x0, (A, B, u_ref, x_ref, ks, Ks))
    xs = jnp.concatenate([xs, xT[None]], axis=0)
    return xs, us
