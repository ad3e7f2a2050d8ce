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


# ---------------------------------------------------------------------------
# Fused control-period integrator: the 100-substep Euler loop as ONE kernel.
#
# Honest slope-measured decomposition (r4, after the tunnel-sync fixes): the
# lax.scan substep loop costs ~1.7 ms per control period — roughly HALF of
# every closed-loop step (LMPC step 3.5 ms = 1.8 solve + 1.7 dynamics) —
# because its body lowers to ~a dozen separate tiny kernels whose per-launch
# latency dominates the ~30 scalar flops of actual work.  Fusing the whole
# loop into one Pallas kernel keeps all state in registers/VMEM: state
# variables live as broadcast (1, 128) tiles (VPU transcendentals), the
# segment table sits in VMEM lanes, and the curvature lookup replicates
# track.curvature's first-match argmax semantics with lane reductions.
#
# TPU DEFAULT since r4 (dynamics.propagate(backend="auto") resolves here on
# TPU; everywhere else it resolves to the scan).  Mosaic's transcendental
# lowerings (sin/cos/arctan) differ from XLA's in the last ulps, so this
# backend is numerically equivalent but NOT bitwise identical to the scan
# path — the pinned CPU goldens certify the scan path, and the TPU-gated
# tier (tests/test_tpu_native.py, executed by the bench harness on real
# silicon) certifies this kernel against the scan with asserted deviation
# bounds per control period and over whole closed-loop laps.
# ---------------------------------------------------------------------------

_LANES = 128


def _prop_kernel_body(n_sub: int, sub_dt: float):
    def kernel(tbl_ref, st_ref, out_ref):
        # iota built IN-kernel (a captured constant would be rejected);
        # Mosaic's tpu.iota is integer-only — cast afterwards
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        lane = lane_i.astype(jnp.float32)

        def get(vec, i):
            return jnp.sum(jnp.where(lane_i == i, vec, 0.0))

        tbl = tbl_ref[...]  # (4, LANES): s0 | hi | curv | laneidx(unused)
        st = st_ref[...]  # (1, LANES) packed state/params
        s0_row = tbl[0:1]
        hi_row = tbl[1:2]
        curv_row = tbl[2:3]

        # unpack (scalars broadcast back onto tiles on use)
        vx, vy, wz = get(st, 0), get(st, 1), get(st, 2)
        epsi, s, ey = get(st, 3), get(st, 4), get(st, 5)
        psi, X, Y = get(st, 9), get(st, 10), get(st, 11)
        delta, a = get(st, 12), get(st, 13)
        lap_len = get(st, 14)
        m, lf, lr, Iz = get(st, 16), get(st, 17), get(st, 18), get(st, 19)
        Df, Cf, Bf = get(st, 20), get(st, 21), get(st, 22)
        Dr, Cr, Br = get(st, 23), get(st, 24), get(st, 25)
        dt = jnp.float32(sub_dt)
        sin_d = jnp.sin(delta)
        cos_d = jnp.cos(delta)

        def atan(t):
            # Mosaic lowers neither atan nor atan2: three half-angle
            # reductions (|r| < tan(pi/16) ~ 0.199) + 5-term Taylor gives
            # < 2e-9 relative error — beyond f32 precision.  Inputs are
            # clamped so t*t cannot overflow (atan saturates long before).
            t = jnp.clip(t, -1e15, 1e15)

            def half(x):
                return x / (1.0 + jnp.sqrt(1.0 + x * x))

            r = half(half(half(t)))
            z2 = r * r
            p = r * (1.0 + z2 * (
                jnp.float32(-1.0 / 3.0) + z2 * (
                    jnp.float32(0.2) + z2 * (
                        jnp.float32(-1.0 / 7.0) + z2 * jnp.float32(1.0 / 9.0)
                    )
                )
            ))
            return 8.0 * p

        def atan2(y, x):
            # Mosaic has no atan2 lowering: atan(y/x) with the standard
            # sign/pi quadrant correction for x < 0 (and a signed tiny
            # floor on x so y/x saturates instead of dividing by zero).
            # Matches the scan path's jnp.arctan2 for hard-braking /
            # perturbed states where vx dips negative (ADVICE r4).
            x_s = jnp.where(
                x >= 0.0,
                jnp.maximum(x, jnp.float32(1e-30)),
                jnp.minimum(x, jnp.float32(-1e-30)),
            )
            base = atan(y / x_s)
            pi = jnp.float32(3.14159265358979)
            corr = jnp.where(
                x < 0.0, jnp.where(y >= 0.0, pi, -pi), jnp.float32(0.0)
            )
            return base + corr

        def substep(_, carry):
            vx, vy, wz, epsi, s, ey, psi, X, Y = carry
            # curvature: first-match segment (track.curvature semantics);
            # no-match falls back to lane 0 exactly like the scan path's
            # argmax-over-all-False (unreachable while segments tile the
            # lap, but divergence-free if a gapped track ever appears)
            s_w = s - jnp.floor(s / lap_len) * lap_len
            inside = (s_w >= s0_row) & (s_w < hi_row)
            first = jnp.min(jnp.where(inside, lane, jnp.float32(_LANES)))
            first = jnp.where(first >= jnp.float32(_LANES), jnp.float32(0.0), first)
            curv = jnp.sum(jnp.where(lane == first, curv_row, 0.0))

            alpha_f = delta - atan2(vy + lf * wz, vx)
            alpha_r = -atan2(vy - lr * wz, vx)
            Fyf = 2.0 * Df * jnp.sin(Cf * atan(Bf * alpha_f))
            Fyr = 2.0 * Dr * jnp.sin(Cr * atan(Br * alpha_r))
            dvx = a - Fyf * sin_d / m + wz * vy
            dvy = (Fyf * cos_d + Fyr) / m - wz * vx
            dwz = (lf * Fyf * cos_d - lr * Fyr) / Iz

            den = 1.0 - curv * ey
            sin_e = jnp.sin(epsi)
            cos_e = jnp.cos(epsi)
            s_dot = (vx * cos_e - vy * sin_e) / den
            sin_p = jnp.sin(psi)
            cos_p = jnp.cos(psi)

            return (
                vx + dt * dvx,
                vy + dt * dvy,
                wz + dt * dwz,
                epsi + dt * (wz - s_dot * curv),
                s + dt * s_dot,
                ey + dt * (vx * sin_e + vy * cos_e),
                psi + dt * wz,
                X + dt * (vx * cos_p - vy * sin_p),
                Y + dt * (vx * sin_p + vy * cos_p),
            )

        # NOTE: the scan path's step() OVERWRITES xglob's velocity rows
        # from xcurv's each substep (they share dvx/dvy/dwz and the xcurv
        # base), so the kernel carries one velocity set and writes it to
        # both output blocks
        out = jax.lax.fori_loop(
            0, n_sub, substep,
            (vx, vy, wz, epsi, s, ey, psi, X, Y),
        )
        ovx, ovy, owz, oepsi, os_, oey, opsi, oX, oY = out
        vals = (ovx, ovy, owz, oepsi, os_, oey, ovx, ovy, owz, opsi, oX, oY)
        acc = jnp.zeros((1, _LANES), jnp.float32)
        for i, v in enumerate(vals):
            acc = acc + jnp.where(lane_i == i, v, 0.0)
        out_ref[...] = acc

    return kernel


def propagate_fused(track, params, xglob, xcurv, u, control_dt=0.1,
                    sub_dt=0.001, interpret: bool = False):
    """One control period of Euler substeps as a single Pallas kernel.

    Same signature semantics as dynamics.propagate (which dispatches here
    under ``backend="pallas"``); f32 only."""
    from . import track as track_ops_mod

    n_sub = int(round(control_dt / sub_dt))
    K = track.s0.shape[0]
    assert K <= _LANES, "segment table exceeds one lane tile"
    f32 = jnp.float32

    tbl = jnp.full((4, _LANES), 1e30, f32)
    tbl = tbl.at[0, :K].set(track.s0.astype(f32))
    tbl = tbl.at[1, :].set(-1e30)
    tbl = tbl.at[1, :K].set(
        (track.s0 + track.seg_len + track_ops_mod._S_TOL).astype(f32)
    )
    tbl = tbl.at[2, :].set(0.0)
    tbl = tbl.at[2, :K].set(track.curv.astype(f32))

    st = jnp.zeros((1, _LANES), f32)
    st = st.at[0, 0:6].set(xcurv.astype(f32))
    st = st.at[0, 6:12].set(xglob.astype(f32))
    st = st.at[0, 12:14].set(u.astype(f32))
    st = st.at[0, 14].set(track.lap_length.astype(f32))
    par = jnp.stack([
        params.m, params.lf, params.lr, params.Iz,
        params.Df, params.Cf, params.Bf,
        params.Dr, params.Cr, params.Br,
    ]).astype(f32)
    st = st.at[0, 16:26].set(par)

    out = pl.pallas_call(
        _prop_kernel_body(n_sub, float(sub_dt)),
        out_shape=jax.ShapeDtypeStruct((1, _LANES), f32),
        interpret=interpret,
    )(tbl, st)
    xcurv_next = out[0, 0:6]
    xglob_next = out[0, 6:12]
    return xglob_next, xcurv_next
