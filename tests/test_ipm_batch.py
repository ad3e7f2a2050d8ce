"""Batched QP solver parity with the vmapped scalar solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from car_racing_tpu.ops import ipm


def batch_of_qps(B=16, n=12, m=20, p=0, seed=0):
    rng = np.random.default_rng(seed)
    qps = []
    for _ in range(B):
        L = rng.normal(size=(n, n))
        H = L @ L.T + n * np.eye(n)
        g = rng.normal(size=n)
        x_feas = rng.normal(size=n)
        C = rng.normal(size=(m, n))
        d = C @ x_feas - rng.uniform(0.1, 1.0, size=m)
        E = rng.normal(size=(p, n))
        e = E @ x_feas
        qps.append(
            ipm.QP(
                H=jnp.asarray(H), g=jnp.asarray(g), C=jnp.asarray(C),
                d=jnp.asarray(d), E=jnp.asarray(E), e=jnp.asarray(e),
            )
        )
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qps)


@pytest.mark.parametrize("p", [0, 3])
def test_batch_matches_vmapped_scalar(p):
    batch = batch_of_qps(B=8, p=p)
    n = batch.H.shape[1]
    z0 = jnp.zeros((8, n))
    sols_batch = ipm.solve_qp_batch(batch, z0, iters=40)
    sols_vmap = jax.vmap(lambda q, z: ipm.solve_qp(q, z, iters=40))(batch, z0)
    assert bool(sols_batch.converged.all()), np.asarray(sols_batch.kkt_res)
    np.testing.assert_allclose(
        np.asarray(sols_batch.z), np.asarray(sols_vmap.z), atol=1e-6
    )


def test_batch_feasibility():
    batch = batch_of_qps(B=8, p=2, seed=5)
    n = batch.H.shape[1]
    sols = ipm.solve_qp_batch(batch, jnp.zeros((8, n)), iters=40)
    ci = jnp.einsum("bij,bj->bi", batch.C, sols.z) - batch.d
    ce = jnp.einsum("bij,bj->bi", batch.E, sols.z) - batch.e
    assert float(ci.min()) > -1e-8
    assert float(jnp.abs(ce).max()) < 1e-7


def test_condense_tv_matches_rollout():
    """TV condensation equals explicit rollout; LTI fast path equals TV."""
    import numpy as np
    from car_racing_tpu.ops import ocp

    rng = np.random.default_rng(0)
    N, n, m = 7, 6, 2
    A_seq = jnp.asarray(np.stack([np.eye(n) + 0.05 * rng.normal(size=(n, n)) for _ in range(N)]))
    B_seq = jnp.asarray(rng.normal(size=(N, n, m)))
    C_seq = jnp.asarray(rng.normal(size=(N, n)))
    x0 = jnp.asarray(rng.normal(size=n))
    phi, G = ocp.condense(A_seq, B_seq, C_seq, x0)
    U = rng.normal(size=(N, m))
    x = np.asarray(x0)
    xs = []
    for k in range(N):
        x = np.asarray(A_seq[k]) @ x + np.asarray(B_seq[k]) @ U[k] + np.asarray(C_seq[k])
        xs.append(x.copy())
    np.testing.assert_allclose(
        np.asarray(phi) + np.asarray(G) @ U.reshape(-1), np.concatenate(xs), rtol=1e-12
    )
    A, B = A_seq[0], B_seq[0]
    phi2, G2 = ocp.condense_lti(A, B, N, x0)
    A_l = jnp.broadcast_to(A, (N, n, n))
    B_l = jnp.broadcast_to(B, (N, n, m))
    phi3, G3 = ocp.condense(A_l, B_l, jnp.zeros((N, n)), x0)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(G3), atol=1e-12)
    np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi3), atol=1e-12)
