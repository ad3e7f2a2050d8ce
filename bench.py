"""Benchmark: MPC solve latency per control step on the attached TPU.

Measures the per-step MPC-LTI tracking solve (condensed QP -> interior
point, the framework's hot path replacing CasADi/IPOPT) in float32 over a
closed-loop-like sequence of states, and reports p99 latency.

The reference publishes no numbers (BASELINE.md); the north-star target is
p99 < 10 ms per control-step NLP solve on TPU (BASELINE.json).
``vs_baseline`` is target/actual: >= 1.0 means the target is met, higher is
better.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from car_racing_tpu.models import controllers
    from car_racing_tpu.utils import params

    dtype = jnp.float32
    mpc_param = params.MPCParam.default(vt=0.8)
    sys_param = params.SystemParam.default()
    xtarget = jnp.asarray(np.array([0.8, 0, 0, 0, 0, 0]), dtype)
    width = jnp.asarray(0.8, dtype)

    step = jax.jit(
        lambda x, w: controllers.mpc_lti(x, xtarget, mpc_param, sys_param, width, u_warm=w)
    )

    # a drifting state sequence resembling closed-loop tracking
    rng = np.random.default_rng(0)
    n_iters = 300
    states = np.zeros((n_iters, 6), np.float32)
    states[:, 0] = 0.8 + 0.1 * np.sin(np.linspace(0, 20, n_iters))
    states[:, 3] = 0.05 * rng.standard_normal(n_iters)
    states[:, 4] = np.cumsum(np.full(n_iters, 0.08))
    states[:, 5] = 0.2 * np.sin(np.linspace(0, 12, n_iters))

    w = jnp.zeros(mpc_param.num_horizon * 2, dtype)
    # warm-up / compile
    u = step(jnp.asarray(states[0]), w)
    jax.block_until_ready(u)

    lat = []
    for i in range(n_iters):
        x = jnp.asarray(states[i])
        t0 = time.perf_counter()
        u = step(x, w)
        jax.block_until_ready(u)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    p99 = float(np.percentile(lat, 99))
    print(
        json.dumps(
            {
                "metric": "mpc_lti_solve_latency_p99",
                "value": round(p99, 4),
                "unit": "ms",
                "vs_baseline": round(10.0 / p99, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
