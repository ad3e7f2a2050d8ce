"""Pallas TPU kernels for the solver hot loops.

The interior-point Newton systems of this framework are *tiny* (n = 20-80)
but come in *large batches* (overtake branches x scenarios x vehicles, the
256-branch racing-game sweeps of BASELINE.json).  XLA's batched LU on TPU
pays per-matrix overheads at these sizes; the kernels here use the opposite
layout — **batch on the lane dimension**: matrices are stored (n, n, B) so
every scalar step of the factorization is a (8,128)-wide VPU op across 128+
problems at once.  The stage recursion (over n) is a statically unrolled
loop, which is exactly the block-tridiagonal-factorization shape of the
Riccati/KKT north star: sequential in the stage index, massively parallel
across problems.

Falls back to ``jnp.linalg`` off-TPU (and under ``interpret=True`` for CPU
tests of the kernel itself).

**Dispatch policy (re-measured 2026-08, libtpu for v5e):** with
dispatch-amortized scan timing (200 reps per measurement — the earlier
20-rep methodology hid everything under the ~25 ms tunnel dispatch and
mis-ranked the kernels), the lane-major Pallas kernel solves a
(256, 20, 20) SPD batch in ~15 us net while XLA's batched Cholesky takes
~560 us — ~40x.  That single factorization was ~95% of the 256-branch
sweep's device time at the XLA default.  ``solve_batched``/
``solve_multi_batched`` therefore default to the PALLAS kernels on TPU;
set ``CAR_RACING_TPU_PALLAS_SOLVE=0`` to fall back to XLA's batched
Cholesky.

Re-validated 2026-08 (r4) with the overhead-cancelling slope method
(after discovering the tunnel's ~25-30 ms fixed per-call overhead and
its sub-threshold sync hazard, see bench.py/_timed_fused): timing scans
of 200 vs 1000 solves and taking the slope gives ~3 us per (256,20,20)
Pallas solve vs ~1.4 ms per XLA batched LU solve — the dispatch policy's
margin is, if anything, larger than the original 40x figure.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ~16 MB of scoped VMEM per core on v5e; keep the kernel's working set
# (a_work + L columns + stack temporaries, ~2 copies of (n, n, blk) f32)
# comfortably under it by shrinking the lane block as n grows.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _lane_block(n: int, requested: int, itemsize: int = 4) -> int:
    cap = _VMEM_BUDGET_BYTES // (2 * n * n * itemsize)
    cap = max(128, (cap // 128) * 128)
    return min(requested, cap)


def _cholesky_solve_kernel(a_ref, b_ref, x_ref):
    """Solve A x = b for a lane-major batch.

    a_ref: (n, n, B) SPD matrices (batch last = lanes)
    b_ref: (n, B) right-hand sides
    x_ref: (n, B) solutions

    In-kernel: unrolled Cholesky A = L L^T, then forward/back substitution —
    every line is a vector op over the whole batch.
    """
    n = a_ref.shape[0]
    a = a_ref[:]  # (n, n, B)
    b = b_ref[:]  # (n, B)

    # Cholesky factorization (lower), built column by column with rank-1
    # downdates; every op is vectorized across the lane (batch) dimension.
    l_cols = []  # l_cols[j] : (n, B) column j of L
    a_work = a
    for j in range(n):
        diag = jnp.maximum(a_work[j, j], 1e-30)  # (B,)
        inv_sqrt = jax.lax.rsqrt(diag)
        col = a_work[:, j] * inv_sqrt[None, :]  # (n, B); rows < j are garbage
        # zero the strictly-upper part of the column
        mask = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) >= j).astype(col.dtype)
        col = col * mask
        l_cols.append(col)
        # rank-1 downdate of the trailing submatrix: A -= col col^T
        a_work = a_work - col[:, None, :] * col[None, :, :]
    # L as (n, n, B): L[:, j] = l_cols[j]
    # forward substitution L y = b
    y_rows = []
    for i in range(n):
        acc = b[i]
        for j in range(i):
            acc = acc - l_cols[j][i] * y_rows[j]
        y_rows.append(acc / jnp.maximum(l_cols[i][i], 1e-30))
    # back substitution L^T x = y
    x_rows: list = [None] * n
    for i in range(n - 1, -1, -1):
        acc = y_rows[i]
        for j in range(i + 1, n):
            acc = acc - l_cols[i][j] * x_rows[j]
        x_rows[i] = acc / jnp.maximum(l_cols[i][i], 1e-30)
    x_ref[:] = jnp.stack(x_rows, axis=0)


def _cholesky_solve_block(a_t: jax.Array, b_t: jax.Array, interpret: bool) -> jax.Array:
    """One lane block through the kernel. a_t: (n, n, blk); b_t: (n, blk)."""
    n = a_t.shape[0]
    blk = a_t.shape[2]
    return pl.pallas_call(
        _cholesky_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((n, blk), a_t.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_t, b_t)


@partial(jax.jit, static_argnames=("interpret", "block_b"))
def cholesky_solve_batched(
    A: jax.Array, b: jax.Array, interpret: bool = False, block_b: int = 512
) -> jax.Array:
    """Solve a batch of SPD systems A[i] x[i] = b[i] with the lane-major
    Pallas kernel.  A: (B, n, n); b: (B, n).  Returns (B, n).

    Large batches are split into lane blocks of ``block_b`` and streamed
    through the kernel with ``lax.map`` so each block fits VMEM; B is
    zero-padded to a block multiple (padded problems solve the identity)."""
    B, n, _ = A.shape
    blk = _lane_block(n, min(block_b, max(128, B)), A.dtype.itemsize)
    pad = (-B) % blk
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A = jnp.concatenate([A, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)], axis=0)
    Bp = B + pad
    a_t = jnp.transpose(A, (1, 2, 0)).reshape(n, n, Bp // blk, blk)  # lanes last
    b_t = jnp.transpose(b, (1, 0)).reshape(n, Bp // blk, blk)
    a_chunks = jnp.moveaxis(a_t, 2, 0)  # (nblk, n, n, blk)
    b_chunks = jnp.moveaxis(b_t, 1, 0)  # (nblk, n, blk)
    x_chunks = jax.lax.map(
        lambda ab: _cholesky_solve_block(ab[0], ab[1], interpret), (a_chunks, b_chunks)
    )  # (nblk, n, blk)
    x_t = jnp.moveaxis(x_chunks, 0, 1).reshape(n, Bp)
    return jnp.transpose(x_t, (1, 0))[:B]


def _use_pallas_solve() -> bool:
    return (
        jax.default_backend() == "tpu"
        and os.environ.get("CAR_RACING_TPU_PALLAS_SOLVE", "1") == "1"
    )


def solve_batched(A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched SPD solve (see module docstring for the dispatch policy)."""
    if _use_pallas_solve():
        return cholesky_solve_batched(A, b)
    L = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((L, True), b[..., None])[..., 0]


def _cholesky_solve_multi_kernel(a_ref, b_ref, x_ref):
    """Multi-RHS variant: factor once, substitute r times.

    a_ref: (n, n, B); b_ref: (r, n, B); x_ref: (r, n, B).
    """
    n = a_ref.shape[0]
    r = b_ref.shape[0]
    a_work = a_ref[:]
    l_cols = []
    for j in range(n):
        diag = jnp.maximum(a_work[j, j], 1e-30)
        inv_sqrt = jax.lax.rsqrt(diag)
        col = a_work[:, j] * inv_sqrt[None, :]
        mask = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) >= j).astype(col.dtype)
        col = col * mask
        l_cols.append(col)
        a_work = a_work - col[:, None, :] * col[None, :, :]
    for rr in range(r):
        b = b_ref[rr]
        y_rows = []
        for i in range(n):
            acc = b[i]
            for j in range(i):
                acc = acc - l_cols[j][i] * y_rows[j]
            y_rows.append(acc / jnp.maximum(l_cols[i][i], 1e-30))
        x_rows: list = [None] * n
        for i in range(n - 1, -1, -1):
            acc = y_rows[i]
            for j in range(i + 1, n):
                acc = acc - l_cols[i][j] * x_rows[j]
            x_rows[i] = acc / jnp.maximum(l_cols[i][i], 1e-30)
        x_ref[rr] = jnp.stack(x_rows, axis=0)


def _cholesky_solve_multi_block(a_t, b_t, interpret):
    """a_t: (n, n, blk); b_t: (r, n, blk) -> (r, n, blk)."""
    n, _, blk = a_t.shape
    r = b_t.shape[0]
    return pl.pallas_call(
        _cholesky_solve_multi_kernel,
        out_shape=jax.ShapeDtypeStruct((r, n, blk), a_t.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_t, b_t)


@partial(jax.jit, static_argnames=("interpret", "block_b"))
def cholesky_solve_multi_batched(
    A: jax.Array, Brhs: jax.Array, interpret: bool = False, block_b: int = 256
) -> jax.Array:
    """Multi-RHS batched SPD solve: A (B, n, n), Brhs (B, n, r) -> (B, n, r).

    Factors each matrix once in VMEM and substitutes all r right-hand
    sides (the shape of one block-eliminated KKT step: r = 1 + p)."""
    B, n, _ = A.shape
    r = Brhs.shape[2]
    blk = _lane_block(n, min(block_b, max(128, B)), A.dtype.itemsize)
    pad = (-B) % blk
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A = jnp.concatenate([A, eye], axis=0)
        Brhs = jnp.concatenate([Brhs, jnp.zeros((pad, n, r), Brhs.dtype)], axis=0)
    Bp = B + pad
    a_t = jnp.transpose(A, (1, 2, 0)).reshape(n, n, Bp // blk, blk)
    b_t = jnp.transpose(Brhs, (2, 1, 0)).reshape(r, n, Bp // blk, blk)
    a_chunks = jnp.moveaxis(a_t, 2, 0)  # (nblk, n, n, blk)
    b_chunks = jnp.moveaxis(b_t, 2, 0)  # (nblk, r, n, blk)
    x_chunks = jax.lax.map(
        lambda ab: _cholesky_solve_multi_block(ab[0], ab[1], interpret),
        (a_chunks, b_chunks),
    )  # (nblk, r, n, blk)
    x_t = jnp.moveaxis(x_chunks, 0, 2).reshape(r, n, Bp)
    return jnp.transpose(x_t, (2, 1, 0))[:B]


def solve_multi_batched(A: jax.Array, Brhs: jax.Array) -> jax.Array:
    """Multi-RHS batched SPD solve (same dispatch policy as solve_batched)."""
    if _use_pallas_solve():
        return cholesky_solve_multi_batched(A, Brhs)
    L = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((L, True), Brhs)
