"""Device-mesh parallelism: branch/scenario sweeps over TPU meshes.

The reference's parallelism is one OS process per overtake branch with
results gathered through Manager dicts (overtake_traj_planner.py:177-204)
plus ROS pub/sub between realtime nodes.  The TPU-native design (SURVEY §2
parallelism inventory): branch batches are vmapped per chip and sharded
across a mesh with ``shard_map``; best-branch selection and safe-set
exchange ride XLA collectives over ICI.

Axes:
- ``scenario`` — data parallelism over independent simulations / vehicles
  (the DP analog for this workload).
- ``branch``   — the overtake-corridor sweep (scenario/branch parallelism).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ipm, ocp
from ..utils.constants import U_DIM, X_DIM


def make_mesh(n_devices: int | None = None):
    """Build a ('scenario', 'branch') mesh over the first n devices."""
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devs)
    n_scen = 2 if n % 2 == 0 and n >= 4 else 1
    shape = (n_scen, n // n_scen)
    return Mesh(np.asarray(devs).reshape(shape), ("scenario", "branch"))


def _branch_tracking_qp_build(A, B, N, Q, R, x0, s_ref, ey_ref, width, dtype):
    """Build a per-branch condensed QP (progress + reference tracking +
    bounds) — the problem each mesh shard batches over its local branches."""
    A_seq, B_seq, C_seq = ocp.lti_sequences(A, B, N)
    phi, G = ocp.condense(A_seq, B_seq, C_seq, x0)
    n_u = N * U_DIM
    sel_s = jnp.arange(N) * X_DIM + 4
    sel_ey = jnp.arange(N) * X_DIM + 5
    G_s, p_s = G[sel_s], phi[sel_s]
    G_ey, p_ey = G[sel_ey], phi[sel_ey]
    H = 2 * 20.0 * (G_ey.T @ G_ey + G_s.T @ G_s) + 1e-6 * jnp.eye(n_u, dtype=dtype)
    g = 2 * 20.0 * (G_ey.T @ (p_ey - ey_ref) + G_s.T @ (p_s - s_ref))
    g = g - 200.0 * G[-X_DIM + 4]
    I_u = jnp.eye(n_u, dtype=dtype)
    C = jnp.concatenate([I_u, -I_u, G_ey, -G_ey], axis=0)
    d = jnp.concatenate(
        [
            jnp.tile(jnp.asarray([-0.5, -1.5], dtype), N),
            -jnp.tile(jnp.asarray([0.5, 1.5], dtype), N),
            -width - p_ey,
            p_ey - width,
        ]
    )
    return ipm.QP(H=H, g=g, C=C, d=d, E=jnp.zeros((0, n_u), dtype), e=jnp.zeros(0, dtype))


def _branch_tracking_qp(A, B, N, Q, R, x0, s_ref, ey_ref, width, dtype):
    """Single-problem convenience wrapper (oracle for tests)."""
    qp = _branch_tracking_qp_build(A, B, N, Q, R, x0, s_ref, ey_ref, width, dtype)
    sol = ipm.solve_qp(qp, jnp.zeros(qp.H.shape[0], dtype), iters=20)
    cost = 0.5 * sol.z @ qp.H @ sol.z + qp.g @ sol.z
    return sol.z, cost


_SWEEP_CACHE: dict = {}


def branch_sweep(mesh: Mesh, x0_scen: jax.Array, s_refs: jax.Array, ey_refs: jax.Array,
                 A: jax.Array, B: jax.Array, Q: jax.Array, R: jax.Array,
                 width: jax.Array, num_horizon: int = 10):
    """Sharded racing-game branch sweep + best-branch selection.

    x0_scen: (S, X_DIM) per-scenario ego states (sharded over 'scenario');
    s_refs/ey_refs: (S, BR, N) per-branch references (BR sharded over
    'branch').  Returns (best_idx (S,), best_U (S, N*U_DIM)) — the argmin
    reduction replaces the reference's host-side gather over Manager dicts.

    The compiled sharded program is cached per (mesh, horizon, dtype) so
    repeated sweeps (every overtake control step) pay zero retrace.
    """
    N = num_horizon
    dtype = x0_scen.dtype
    cache_key = (mesh, N, jnp.dtype(dtype).name)
    cached = _SWEEP_CACHE.get(cache_key)
    if cached is not None:
        return cached(x0_scen, s_refs, ey_refs, A, B, Q, R, width)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P("scenario"),
            P("scenario", "branch"),
            P("scenario", "branch"),
            P(),
            P(),
            P(),
            P(),
            P(),
        ),
        out_specs=(P("scenario"), P("scenario")),
        check_vma=False,  # the QP solver's scan carry mixes varying/invariant
    )
    def sweep(x0_l, s_ref_l, ey_ref_l, A, B, Q, R, width):
        S_l, BR_l, _ = s_ref_l.shape
        n_u = N * U_DIM
        # The condensed matrices (G and everything built from it: H, C, and
        # the phi-dependent d) are *branch-invariant* — only the linear term
        # g varies with the per-branch references.  Build the shared parts
        # once per scenario and broadcast, then run ONE flat batched
        # interior-point solve (a vmapped pallas_call would re-grid the
        # kernel; one flat batch avoids it).
        def scen_parts(x0):
            phi, G = ocp.condense_lti(A, B, N, x0)
            sel_s = jnp.arange(N) * X_DIM + 4
            sel_ey = jnp.arange(N) * X_DIM + 5
            G_s, p_s = G[sel_s], phi[sel_s]
            G_ey, p_ey = G[sel_ey], phi[sel_ey]
            H = 2 * 20.0 * (G_ey.T @ G_ey + G_s.T @ G_s) + 1e-6 * jnp.eye(n_u, dtype=dtype)
            I_u = jnp.eye(n_u, dtype=dtype)
            C = jnp.concatenate([I_u, -I_u, G_ey, -G_ey], axis=0)
            d = jnp.concatenate(
                [
                    jnp.tile(jnp.asarray([-0.5, -1.5], dtype), N),
                    -jnp.tile(jnp.asarray([0.5, 1.5], dtype), N),
                    -width - p_ey,
                    p_ey - width,
                ]
            )
            return H, C, d, G_s, G_ey, p_s, p_ey, G[-X_DIM + 4]

        H_s, C_s, d_s, G_s, G_ey, p_s, p_ey, g_prog = jax.vmap(scen_parts)(x0_l)

        def g_of(sidx):
            def per_branch(sr, er):
                g = 2 * 20.0 * (
                    G_ey[sidx].T @ (p_ey[sidx] - er) + G_s[sidx].T @ (p_s[sidx] - sr)
                )
                return g - 200.0 * g_prog[sidx]

            return per_branch

        gs = jnp.stack(
            [jax.vmap(g_of(s))(s_ref_l[s], ey_ref_l[s]) for s in range(S_l)]
        )  # (S_l, BR_l, n_u)

        bcast = lambda a: jnp.broadcast_to(a[:, None], (S_l, BR_l) + a.shape[1:])
        qp_batch = ipm.QP(
            H=bcast(H_s),
            g=gs,
            C=bcast(C_s),
            d=bcast(d_s),
            E=jnp.zeros((S_l, BR_l, 0, n_u), dtype),
            e=jnp.zeros((S_l, BR_l, 0), dtype),
        )
        flat = jax.tree.map(lambda a: a.reshape((S_l * BR_l,) + a.shape[2:]), qp_batch)
        sol = ipm.solve_qp_batch(
            flat, jnp.zeros((S_l * BR_l, n_u), dtype), iters=20
        )
        zs = sol.z.reshape(S_l, BR_l, -1)
        costs = (
            0.5 * jnp.einsum("sbi,sbij,sbj->sb", zs, qp_batch.H, zs)
            + jnp.einsum("sbi,sbi->sb", qp_batch.g, zs)
        )

        def select(costs_s, zs_s):
            # global best across the branch axis: gather all shard costs
            all_costs = jax.lax.all_gather(costs_s, "branch", tiled=False).reshape(-1)
            best = jnp.argmin(all_costs)
            n_local = costs_s.shape[0]
            my_rank = jax.lax.axis_index("branch")
            local_best = best - my_rank * n_local
            has_best = (local_best >= 0) & (local_best < n_local)
            z_best = jnp.where(
                has_best, zs_s[jnp.clip(local_best, 0, n_local - 1)], jnp.zeros_like(zs_s[0])
            )
            # sum across shards: only the owner contributes non-zeros
            z_best = jax.lax.psum(z_best, "branch")
            return best, z_best

        return jax.vmap(select)(costs, zs)

    compiled = jax.jit(sweep)
    _SWEEP_CACHE[cache_key] = compiled
    return compiled(x0_scen, s_refs, ey_refs, A, B, Q, R, width)


def safe_set_exchange(mesh: Mesh, lap_traj: jax.Array):
    """All-gather each scenario shard's newest lap trajectory so every
    device holds the full safe set (the LMPC safe-set exchange of SURVEY
    §5.8; replaces pickle/ROS transport).  Expressed as a resharding —
    XLA inserts the all-gather collective over ICI."""
    sharded = jax.device_put(lap_traj, NamedSharding(mesh, P("scenario")))
    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(sharded)


def dryrun(n_devices: int) -> None:
    """One full multi-chip step on tiny shapes: 256-branch sweep sharded
    over ('scenario','branch') + collective best-branch selection + safe-set
    all-gather.  Used by the driver's multichip dry run."""
    mesh = make_mesh(n_devices)
    S = mesh.shape["scenario"]
    BR_total = 256
    N = 4  # tiny horizon for the dry run
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 0.1, (S, X_DIM)), dtype)
    base_s = np.cumsum(np.full((S, BR_total, N), 0.08), axis=-1)
    s_refs = jnp.asarray(base_s + rng.normal(0, 0.01, (S, BR_total, N)), dtype)
    ey_refs = jnp.asarray(rng.normal(0, 0.2, (S, BR_total, N)), dtype)
    A = jnp.eye(X_DIM, dtype=dtype) + 0.01 * jnp.asarray(rng.normal(size=(X_DIM, X_DIM)), dtype)
    B = jnp.asarray(0.1 * rng.normal(size=(X_DIM, U_DIM)), dtype)
    Q = jnp.eye(X_DIM, dtype=dtype)
    R = jnp.eye(U_DIM, dtype=dtype)

    best_idx, best_U = branch_sweep(
        mesh, x0, s_refs, ey_refs, A, B, Q, R, jnp.asarray(0.8, dtype), num_horizon=N
    )
    jax.block_until_ready((best_idx, best_U))
    assert best_idx.shape == (S,)
    assert best_U.shape == (S, N * U_DIM)

    lap = jnp.asarray(rng.normal(size=(S, 8, X_DIM)), dtype)
    full = safe_set_exchange(mesh, lap)
    jax.block_until_ready(full)
    assert full.shape == (S, 8, X_DIM)
    print(
        f"dryrun ok: mesh={dict(mesh.shape)} branches={BR_total} "
        f"best={np.asarray(best_idx)}"
    )
