"""Benchmark: batched centroidal-MPC solves/s per chip at horizon N=10.

Prints ONE JSON line. Baseline context (BASELINE.md): the north star is
>= 10k solves/s aggregate on a v5e-16, i.e. 625 solves/s/chip; the reference
itself runs 1 solve at a time at ~50 Hz on CPU. ``vs_baseline`` is
value / 625 (per-chip share of the north-star target).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cheeta_mpc_tpu.examples import TEST_WEIGHTS, make_example_inputs
    from cheeta_mpc_tpu.mpc.centroidal_mpc import (CentroidalMpcConfig,
                                                   build_centroidal_solver)
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.solvers.scp import ScpSettings

    horizon = 10
    batch = 512
    cfg = CentroidalMpcConfig(mass=8.0, num_legs=4, horizon=horizon, dt=0.01,
                              weights=tuple(TEST_WEIGHTS), mu=(0.8,) * 4,
                              dtype=jnp.float32)
    # Deployment-quality solve: 2 SQP iterations (vs the reference legged
    # task's real-time-iteration 1, task.info:34), 10 IPM iterations.
    scp = ScpSettings(iterations=2, ipm=IpmSettings(iters=10))
    solve = jax.jit(jax.vmap(build_centroidal_solver(cfg, scp)))

    state, des_state, des_inputs = make_example_inputs(cfg, batch=batch)
    args = tuple(jnp.asarray(a, cfg.dtype)
                 for a in (state, des_state, des_inputs))

    # Warmup / compile.
    sol = solve(*args)
    jax.block_until_ready(sol.contact_force)
    assert np.isfinite(np.asarray(sol.contact_force)).all()

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        sol = solve(*args)
    jax.block_until_ready(sol.contact_force)
    dt_s = (time.perf_counter() - t0) / reps
    solves_per_s = batch / dt_s

    result = {
        "metric": f"centroidal_mpc_solves_per_s_chip_N{horizon}",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 625.0, 3),
        "batch": batch,
        "batch_latency_ms": round(dt_s * 1e3, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
