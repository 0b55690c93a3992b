"""Benchmark: the BASELINE.md metrics on the real chip.

Prints ONE JSON line. Primary metric: batched centroidal-MPC solves/s per
chip at horizon N=10 (north star >= 10k solves/s aggregate on a v5e-16 =>
625 solves/s/chip; ``vs_baseline`` = value / 625). Also reports the
real-time path the reference was built for (task.info:108, 50 Hz => 20 ms;
BASELINE.json budget 25-40 ms):

- ``batch1_cold_p50/p99_ms``: single-robot solve from scratch (2 SQP x 10
  IPM deployment quality).
- ``batch1_warm_p50/p99_ms``: the MPC-loop tick — warm-started from the
  previous solution shifted one node (the reference's warm start,
  MultipleShootingSolver.cpp:229-265) with the real-time-iteration budget
  (1 SQP, task.info:34).
- ``legged_solves_per_s_chip_N67`` + p99: the reference-scale legged task
  (~67 nodes, dt 0.015, nx=nu=24, task.info:33,102) in soft-cone mode.
- ``legged_batch_solves_per_s_chip_N67``: the same task vmapped over a
  512-scenario batch — the fleet-scale throughput of BASELINE config 4.

Tail of the run executes a small on-TPU f32 test tier (swing-force zeros,
weight-support sanity, finiteness) — failures raise, so a green bench line
implies the f32 device path is numerically sound.
"""

import json
import time

import numpy as np


def _percentiles(f, args, reps):
    """Latency with HOST MATERIALIZATION (np.asarray) — on the axon relay,
    block_until_ready can resolve at enqueue rather than completion, so
    fetching the bytes is the only honest completion barrier (and matches
    what the MPC loop does with the policy anyway)."""
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    return (round(float(np.percentile(lat, 50)), 2),
            round(float(np.percentile(lat, 99)), 2))


def _guard_against_slow_session():
    """The axon/IFRT-proxy transport occasionally lands a session on a
    degraded relay path where every multi-buffer execute costs ~20 ms
    regardless of the program (most sessions dispatch in <0.1 ms). Probe
    with a trivial 2-arg program and re-exec once if degraded, so the
    recorded numbers measure the framework, not relay luck."""
    import os
    import sys

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a, b: a + b)
    x = jnp.ones((32,), jnp.float32)
    np.asarray(f(x, x))
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(f(x, x))
        lat.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(np.asarray(lat), 50))
    attempt = int(os.environ.get("CHEETA_BENCH_REEXEC", "0"))
    if p50 > 5.0 and attempt < 3:
        # A re-exec draws a fresh relay connection; one draw is often not
        # enough to escape a degraded path, so retry up to 3 times.
        print(f"# slow dispatch session detected ({p50:.2f} ms); "
              f"restarting (attempt {attempt + 1}/3)", flush=True)
        os.environ["CHEETA_BENCH_REEXEC"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    if p50 > 5.0:
        print(f"# WARNING: degraded dispatch floor persists ({p50:.2f} ms); "
              "batch-1 latencies below include ~this much per-call transport",
              flush=True)


def main():
    import jax
    import jax.numpy as jnp

    _guard_against_slow_session()

    # Persistent compile cache: the slow-session re-execs and repeated
    # driver runs then skip the multi-second XLA compiles (verified to work
    # through the axon remote-compile tunnel).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cheeta_mpc_tpu.examples import TEST_WEIGHTS, make_example_inputs
    from cheeta_mpc_tpu.mpc.centroidal_mpc import (CentroidalMpcConfig,
                                                   build_centroidal_solver)
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.solvers.scp import ScpSettings

    horizon = 10
    cfg = CentroidalMpcConfig(mass=8.0, num_legs=4, horizon=horizon, dt=0.01,
                              weights=tuple(TEST_WEIGHTS), mu=(0.8,) * 4,
                              dtype=jnp.float32)
    # Deployment-quality solve: 2 SQP iterations (vs the reference legged
    # task's real-time-iteration 1, task.info:34), 10 IPM iterations.
    scp = ScpSettings(iterations=2, ipm=IpmSettings(iters=10))
    solve_one = build_centroidal_solver(cfg, scp)

    # ---- throughput at batch 1024 (the scaling headline) --------------------
    # 1024 is the measured sweet spot on v5e (+12% over 512; 2048 regresses).
    batch = 1024
    solve_b = jax.jit(jax.vmap(solve_one))
    state, des_state, des_inputs = make_example_inputs(cfg, batch=batch)
    args_b = tuple(jnp.asarray(a, cfg.dtype)
                   for a in (state, des_state, des_inputs))
    force = np.asarray(solve_b(*args_b).contact_force)
    assert np.isfinite(force).all()
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        force = np.asarray(solve_b(*args_b).contact_force)
    dt_s = (time.perf_counter() - t0) / reps
    solves_per_s = batch / dt_s

    # ---- batch-1 cold latency ----------------------------------------------
    # The real-time path uses the condensed backend (HPIPM's condensing-mode
    # analogue): ~2x lower sequential latency than the Riccati scan at short
    # horizons (PERF.md table), with the whole dense IPM fused into one
    # VMEM-resident Pallas kernel (ops/pallas_ipm.py).
    cold_scp = ScpSettings(iterations=2, ipm=IpmSettings(iters=10),
                           qp_backend='condensed_pallas')
    solve1 = jax.jit(build_centroidal_solver(cfg, cold_scp))
    s1, d1, i1 = make_example_inputs(cfg)
    args1 = tuple(jnp.asarray(a, cfg.dtype) for a in (s1, d1, i1))
    f_cold = lambda *a: solve1(*a).contact_force
    np.asarray(f_cold(*args1))
    cold_p50, cold_p99 = _percentiles(f_cold, args1, 50)

    # ---- batch-1 warm MPC tick (the 50 Hz loop) ----------------------------
    rti = ScpSettings(iterations=1, ipm=IpmSettings(iters=6),
                      qp_backend='condensed_pallas')
    solve_warm = jax.jit(build_centroidal_solver(cfg, rti))

    def tick(state, des_state, des_inputs, x_prev, u_prev):
        # Receding horizon: warm = previous solution shifted one node
        # (reference MultipleShootingSolver.cpp:229-265).
        x_w = jnp.concatenate([x_prev[1:], x_prev[-1:]])
        u_w = jnp.concatenate([u_prev[1:], u_prev[-1:]])
        sol = solve_warm(state, des_state, des_inputs, warm=(x_w, u_w))
        return sol.x_traj, sol.u_traj, sol.contact_force

    tick_j = jax.jit(tick)
    sol0 = solve1(*args1)
    x_prev, u_prev = sol0.x_traj, sol0.u_traj
    np.asarray(tick_j(*args1, x_prev, u_prev)[2])
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        x_prev, u_prev, force_w = tick_j(*args1, x_prev, u_prev)
        np.asarray(force_w)  # host materialization = honest completion
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    warm_p50 = round(float(np.percentile(lat, 50)), 2)
    warm_p99 = round(float(np.percentile(lat, 99)), 2)
    assert np.isfinite(np.asarray(force_w)).all()

    # ---- reference-scale legged task (N=67, task.info) ---------------------
    from cheeta_mpc_tpu.mpc.legged_mpc import (LeggedMpcConfig,
                                               build_legged_solver)
    lcfg = LeggedMpcConfig.from_task_info(
        "/root/reference/ocs2_legged_robot/config/mpc/task.info",
        cone_mode='soft', dtype=jnp.float32)  # horizon = 1.0 s / 0.015 = 67
    # RTI (task.info:34) with the fused Pallas eq-Riccati kernel — the
    # full backward/forward pass is one kernel, ~1 ms of device time
    # (PERF.md).
    lsolve = jax.jit(build_legged_solver(
        lcfg, ScpSettings(iterations=1,
                          ipm=IpmSettings(eq_backend='pallas'))))
    NL_ = lcfg.horizon
    x0l = np.zeros(24, np.float32)
    x0l[8] = 0.3
    x0l[12:] = [0., 0.4, -0.8, 0., -0.4, 0.8, 0., 0.4, -0.8, 0., -0.4, 0.8]
    x_ref = np.tile(x0l, (NL_ + 1, 1))
    enable = np.ones((NL_, 4), np.float32)
    enable[::2, 1] = 0.0
    enable[::2, 2] = 0.0
    zp = np.zeros((NL_, 4), np.float32)
    zv = np.zeros((NL_, 4), np.float32)
    largs = tuple(jnp.asarray(a, jnp.float32)
                  for a in (x0l, x_ref, enable, zp, zv))
    f_leg = lambda *a: lsolve(*a).forces
    lf = np.asarray(f_leg(*largs))
    leg_p50, leg_p99 = _percentiles(f_leg, largs, 30)
    assert np.isfinite(lf).all()

    # ---- batched legged throughput (BASELINE config 4 at fleet scale) ------
    lbatch = 512
    lsolve_b = jax.jit(jax.vmap(build_legged_solver(
        lcfg, ScpSettings(iterations=1, ipm=IpmSettings(eq_backend='scan')))))
    x0b = np.tile(x0l, (lbatch, 1)).astype(np.float32)
    x0b[:, 0] = 0.05 * np.random.default_rng(0).standard_normal(lbatch)
    bargs = (jnp.asarray(x0b),
             jnp.asarray(np.repeat(x0b[:, None, :], NL_ + 1, axis=1)),
             jnp.asarray(np.tile(enable, (lbatch, 1, 1))),
             jnp.asarray(np.tile(zp, (lbatch, 1, 1))),
             jnp.asarray(np.tile(zv, (lbatch, 1, 1))))
    lfb = np.asarray(lsolve_b(*bargs).forces)
    assert np.isfinite(lfb).all()
    t0 = time.perf_counter()
    for _ in range(5):
        lfb = np.asarray(lsolve_b(*bargs).forces)
    leg_batch_sps = lbatch / ((time.perf_counter() - t0) / 5)

    # ---- on-TPU f32 test tier ----------------------------------------------
    # Swing legs carry exactly zero force (structural gating).
    table = np.zeros((batch, 4, horizon), bool)
    for i in range(4):
        off = i * (4 * horizon + 3)
        table[:, i, :] = np.asarray(args_b[2])[:, off:off + horizon] > 0.5
    swing_mask = ~np.broadcast_to(table[:, :, None, :], force.shape)
    sw = np.abs(force[swing_mask]).max() if swing_mask.any() else 0.0
    assert sw == 0.0, f"swing-leg force leak: {sw}"
    # Stance total Fz tracks weight within 50% on every step (f32 tier).
    fz_tot = force[:, :, 2, :].sum(axis=1)
    assert (np.abs(fz_tot - 78.48) < 0.5 * 78.48).all(), "weight support off"

    result = {
        "metric": f"centroidal_mpc_solves_per_s_chip_N{horizon}",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 625.0, 3),
        "batch": batch,
        "batch_latency_ms": round(dt_s * 1e3, 3),
        "batch1_cold_p50_ms": cold_p50,
        "batch1_cold_p99_ms": cold_p99,
        "batch1_warm_p50_ms": warm_p50,
        "batch1_warm_p99_ms": warm_p99,
        "legged_N": int(NL_),
        "legged_p50_ms": leg_p50,
        "legged_p99_ms": leg_p99,
        "legged_solves_per_s_chip_N67": round(1000.0 / leg_p50, 1),
        "legged_batch_solves_per_s_chip_N67": round(leg_batch_sps, 1),
        "legged_batch": lbatch,
        "f32_tier": "pass",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
