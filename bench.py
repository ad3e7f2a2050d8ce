"""Benchmark: per-control-step MPC solve latency on the attached TPU.

Measures the framework's deployment hot path: the FUSED on-device closed
loop (``racing/fused.py`` — condensed-QP interior-point solve + 100 Euler
dynamics substeps per control step, all inside one ``lax.scan``), which is
how the TPU-native design eliminates the reference's per-step Python->IPOPT
boundary crossing (offboard.py:124-127).  Per-step latency = device time of
an n-step rollout / n; p99 across repeated rollouts.

The reference publishes no numbers (BASELINE.md); the north-star target is
p99 < 10 ms per control-step NLP solve on TPU (BASELINE.json).
``vs_baseline`` = target / actual: >= 1.0 means target met, higher better.

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

    from car_racing_tpu.ops import dynamics, track as track_ops
    from car_racing_tpu.racing import fused
    from car_racing_tpu.utils import params

    dtype = jnp.float32
    track = track_ops.load_track("l_shape", width=0.8)
    track = jax.tree.map(lambda x: jnp.asarray(x, dtype), track)
    bike = jax.tree.map(lambda x: jnp.asarray(x, dtype), dynamics.BicycleParams.default())
    mpc_param = params.MPCParam.default(vt=0.8)
    mpc_param = jax.tree.map(lambda x: jnp.asarray(x, dtype), mpc_param)
    sysp = jax.tree.map(lambda x: jnp.asarray(x, dtype), params.SystemParam.default())
    xtarget = jnp.asarray(np.array([0.8, 0, 0, 0, 0, 0]), dtype)

    n_steps = 100
    run = lambda xc0: fused.rollout_mpc_tracking(
        track, bike, mpc_param, sysp, xtarget,
        xc0, jnp.zeros(6, dtype), n_steps=n_steps,
    )

    # warm-up / compile
    out = run(jnp.zeros(6, dtype))
    jax.block_until_ready(out)

    rng = np.random.default_rng(0)
    reps = 30
    per_step_ms = []
    for r in range(reps):
        xc0 = jnp.asarray(
            np.array([0.1, 0, 0, 0, 0, 0]) + 0.05 * rng.standard_normal(6), dtype
        )
        t0 = time.perf_counter()
        out = run(xc0)
        jax.block_until_ready(out)
        per_step_ms.append((time.perf_counter() - t0) * 1e3 / n_steps)
    per_step_ms = np.asarray(per_step_ms)
    p99 = float(np.percentile(per_step_ms, 99))
    print(
        json.dumps(
            {
                "metric": "mpc_step_latency_p99_fused",
                "value": round(p99, 4),
                "unit": "ms",
                "vs_baseline": round(10.0 / p99, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
