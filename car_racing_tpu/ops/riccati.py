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
        w, V = jnp.linalg.eigh(0.5 * (Quu + Quu.T))
        w = jnp.maximum(w, 0.0) + reg
        Quu_inv = (V * (1.0 / w)) @ V.T
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
