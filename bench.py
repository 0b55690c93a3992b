"""Benchmark: the BASELINE.md metrics on the real chip.

Prints ONE JSON line. Primary metric: batched centroidal-MPC solves/s per
chip at horizon N=10 (north star >= 10k solves/s aggregate on a v5e-16 =>
625 solves/s/chip; ``vs_baseline`` = value / 625). Also reports the
real-time path the reference was built for (task.info:108, 50 Hz => 20 ms;
BASELINE.json budget 25-40 ms):

- ``batch1_cold_p50/p99_ms``: single-robot solve from scratch (2 SQP x 10
  IPM deployment quality) on the fused Riccati-IPM Pallas kernel.
- ``batch1_warm_p50/p99_ms``: the MPC-loop tick — warm-started from the
  previous solution shifted one node (the reference's warm start,
  MultipleShootingSolver.cpp:229-265) with the real-time-iteration budget
  (1 SQP, task.info:34).
- ``legged_*``: the reference-scale legged task (~67 nodes, dt 0.015,
  nx=nu=24, task.info:33,102) in soft-cone mode, batch 1 (fused Pallas
  eq-Riccati kernel) and batch 512 (vmapped scan).

Device-time accounting (VERDICT r3 #1): every hot path also reports
``*_device_ms`` — on-device execution time measured by the slope of a
chained on-device fori_loop (utils/device_timing.py), which cancels the
axon relay's per-dispatch transport cost exactly. The wall-clock
percentiles remain as the end-to-end numbers; the device numbers are the
relay-independent truth. ``mfu_pct`` reports achieved useful FLOP/s
against the v5e bf16 peak from the analytic per-solve FLOP count.

Tail of the run executes the on-TPU test tier: compiled-kernel-vs-scan
oracle comparisons for BOTH Pallas kernels (riccati_pallas IPM on the
centroidal solve; eq-Riccati on the legged solve), plus swing-force zeros,
weight-support sanity, and finiteness — failures raise, so a green bench
line implies the compiled f32 device path is numerically sound
(``tpu_selftest: pass``).
"""

import json
import time

import numpy as np

_PROC_START = time.perf_counter()


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
    recorded numbers measure the framework, not relay luck. (The
    ``*_device_ms`` fields are immune either way.)"""
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
    # When the relay is globally degraded, jax init itself takes minutes —
    # a re-exec would pay that again for the same draw. Only restart when
    # this process reached the probe quickly (healthy init, unlucky draw).
    init_was_fast = (time.perf_counter() - _PROC_START) < 90.0
    if p50 > 5.0 and attempt < 1 and init_was_fast:
        # A re-exec draws a fresh relay connection. One attempt only: each
        # re-exec pays minutes of jax re-init through the tunnel, and since
        # the *_device_ms fields are dispatch-independent, a degraded relay
        # no longer corrupts the primary evidence — it only inflates the
        # wall-clock percentiles, which dispatch_floor_ms quantifies.
        print(f"# slow dispatch session detected ({p50:.2f} ms); "
              f"restarting (attempt {attempt + 1}/1)", flush=True)
        os.environ["CHEETA_BENCH_REEXEC"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    if p50 > 5.0:
        print(f"# WARNING: degraded dispatch floor persists ({p50:.2f} ms); "
              "batch-1 wall latencies below include ~this much per-call "
              "transport (the *_device_ms fields do not)", flush=True)
    return p50


class _ProgressWatchdog:
    """The axon relay occasionally hangs a call indefinitely — observed both
    at jax init and mid-run (9m50 of wall with seconds of CPU; the plugin
    blocked in a socket wait). A process re-exec draws a fresh connection
    and has always recovered it, and the persistent compile cache makes the
    replay up to the hang point fast. Arm a timer that re-execs (3 attempts
    max) whenever no progress has been reported for ``timeout_s``; call
    :meth:`pet` at every stage boundary to reset it. Generous timeout:
    legitimate cold compiles through the remote-compile tunnel take
    minutes."""

    def __init__(self, timeout_s: float = 270.0):
        import os
        import threading
        self._timeout = timeout_s
        self._os = os
        self._threading = threading
        self._timer = None
        self._attempt = int(os.environ.get("CHEETA_BENCH_HANG_RETRY", "0"))
        self.pet("start")

    def _fire(self, stage):
        import sys
        if self._attempt < 3:
            print(f"# no progress for {self._timeout:.0f}s after "
                  f"'{stage}'; re-exec (attempt {self._attempt + 1}/3)",
                  flush=True)
            self._os.environ["CHEETA_BENCH_HANG_RETRY"] = str(
                self._attempt + 1)
            self._os.execv(sys.executable, [sys.executable] + sys.argv)
        print(f"# hung after '{stage}' and retries exhausted; aborting",
              flush=True)
        self._os._exit(3)

    def pet(self, stage: str) -> None:
        if self._timer is not None:
            self._timer.cancel()
        self._timer = self._threading.Timer(self._timeout, self._fire,
                                            args=(stage,))
        self._timer.daemon = True
        self._timer.start()

    def disarm(self) -> None:
        if self._timer is not None:
            self._timer.cancel()


def main():
    dog = _ProgressWatchdog()
    import jax
    import jax.numpy as jnp
    jax.devices()  # force backend init under the watchdog
    dog.pet("jax init")

    # Persistent compile cache, configured BEFORE the first compile and with
    # a zero threshold: every program incl. the trivial dispatch probe is
    # disk-cached, so warm runs never need the remote-compile service at all
    # (it has been observed wedged while executes still worked, and local
    # compilation is unavailable — libtpu version mismatch).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    dispatch_floor_ms = _guard_against_slow_session()
    dog.pet("dispatch probe")

    from cheeta_mpc_tpu.examples import TEST_WEIGHTS, make_example_inputs
    from cheeta_mpc_tpu.mpc.centroidal_mpc import (CentroidalMpcConfig,
                                                   build_centroidal_solver)
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.solvers.scp import ScpSettings
    from cheeta_mpc_tpu.utils.device_timing import (V5E_PEAK_FLOPS,
                                                    centroidal_solve_flops,
                                                    device_time_per_call)

    horizon = 10
    cfg = CentroidalMpcConfig(mass=8.0, num_legs=4, horizon=horizon, dt=0.01,
                              weights=tuple(TEST_WEIGHTS), mu=(0.8,) * 4,
                              dtype=jnp.float32)
    # Deployment-quality solve: 2 SQP iterations (vs the reference legged
    # task's real-time-iteration 1, task.info:34), 10 IPM iterations.
    # Batched fleet config runs matmul_precision='high' (bf16_3x): measured
    # 1e-4 N GRF delta vs the full-f32 'highest' default at N=10 — far
    # inside every tolerance — for ~24% more throughput. The batch-1
    # real-time paths keep the 'highest' floor (in-kernel).
    scp = ScpSettings(iterations=2, ipm=IpmSettings(iters=10),
                      matmul_precision='high')
    solve_one = build_centroidal_solver(cfg, scp)

    # ---- throughput at batch 1024 (the scaling headline) --------------------
    # 1024 is the device-measured sweet spot on v5e (512 ties, 2048+
    # regresses — HBM working-set pressure).
    batch = 1024
    solve_b = jax.jit(jax.vmap(solve_one))
    state, des_state, des_inputs = make_example_inputs(cfg, batch=batch)
    # Pin batch element 0 to the exact batch-1 scenario: the batched scan
    # solve then doubles as the scan-path oracle for the fused-kernel
    # batch-1 solve below, with no extra batch-1 scan compile.
    s1, d1, i1 = make_example_inputs(cfg)  # unbatched scenario
    state[0], des_state[0], des_inputs[0] = s1, d1, i1
    args_b = tuple(jnp.asarray(a, cfg.dtype)
                   for a in (state, des_state, des_inputs))
    _t0 = time.perf_counter()
    force = np.asarray(solve_b(*args_b).contact_force)
    assert np.isfinite(force).all()
    print(f"# batched scan solve compiled+ran t={time.perf_counter()-_t0:.0f}s", flush=True)
    dog.pet("batched solve")
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        force = np.asarray(solve_b(*args_b).contact_force)
    dt_s = (time.perf_counter() - t0) / reps
    solves_per_s = batch / dt_s

    # Device-side execution time of the same batch (dispatch-independent).
    fn_b = jax.vmap(lambda s, d, i: solve_one(s, d, i).contact_force)
    dev_batch_s = device_time_per_call(fn_b, args_b, k_small=2, k_big=8)
    print(f"# batch device-time done: {dev_batch_s*1e3:.1f} ms", flush=True)
    dog.pet("batch device time")
    dev_solves_per_s = batch / dev_batch_s
    flops_per_solve = centroidal_solve_flops(horizon, 33, 24, 32, 2, 10)
    mfu = batch * flops_per_solve / dev_batch_s / V5E_PEAK_FLOPS

    # ---- batched FLEET kernel (lane-batched Pallas IPM) --------------------
    # The round-5 roofline lever (PERF.md levers 2+3): 128 problems per
    # VMEM-resident tile, batch on the vector lanes. Same SQP wrapper; the
    # custom_vmap dispatch swaps the QP executor under vmap.
    fleet_one = build_centroidal_solver(
        cfg, ScpSettings(iterations=2, ipm=IpmSettings(iters=10),
                         qp_backend='riccati_pallas'))
    fleet_b = jax.jit(jax.vmap(fleet_one))
    force_fleet = np.asarray(fleet_b(*args_b).contact_force)
    print("# fleet kernel compiled", flush=True)
    dog.pet("fleet kernel")
    assert np.isfinite(force_fleet).all()
    # Cross-executor oracle: fleet kernel vs the 'high' scan on the WHOLE
    # batch (threshold ~3x the measured executor difference).
    ferr = np.abs(force_fleet - force).max()
    assert ferr < 0.05, f"fleet kernel vs scan GRF mismatch: {ferr} N"
    fn_fleet = jax.vmap(lambda s, d, i: fleet_one(s, d, i).contact_force)
    dev_fleet_s = device_time_per_call(fn_fleet, args_b, k_small=2, k_big=8)
    print(f"# fleet device-time done: {dev_fleet_s*1e3:.1f} ms", flush=True)
    dog.pet("fleet device time")
    fleet_sps = batch / dev_fleet_s
    fleet_wall_p50, _ = _percentiles(
        lambda *a: fleet_b(*a).contact_force, args_b, 10)
    fleet_wall_sps = batch / (fleet_wall_p50 / 1e3)
    mfu_fleet = batch * flops_per_solve / dev_fleet_s / V5E_PEAK_FLOPS

    # ---- batch-1 cold latency ----------------------------------------------
    # The real-time path uses the fused Riccati-structured IPM Pallas kernel
    # (ops/pallas_ipm_riccati.py): the whole fixed-iteration Mehrotra loop is
    # VMEM-resident in one kernel — ~1.6 ms device time for the full 2x10
    # solve (the BLASFEO/HPIPM sqrt-Riccati role, HpipmInterface.cpp:281-301).
    cold_scp = ScpSettings(iterations=2, ipm=IpmSettings(iters=10),
                           qp_backend='riccati_pallas')
    solve1 = jax.jit(build_centroidal_solver(cfg, cold_scp))
    args1 = tuple(jnp.asarray(a, cfg.dtype) for a in (s1, d1, i1))
    f_cold = lambda *a: solve1(*a).contact_force
    force1 = np.asarray(f_cold(*args1))
    print("# batch-1 riccati_pallas compiled", flush=True)
    dog.pet("batch-1 kernel")
    cold_p50, cold_p99 = _percentiles(f_cold, args1, 50)
    dog.pet("batch-1 percentiles")
    solve1_nj = build_centroidal_solver(cfg, cold_scp)
    dev_b1_s = device_time_per_call(
        lambda *a: solve1_nj(*a).contact_force, args1)

    # ---- on-TPU oracle: compiled riccati_pallas kernel vs the scan path ----
    # (batch element 0 of the batched scan solve is the same scenario.)
    # ~3x the measured error (r04: 0.0 N kernel-vs-'high'-scan at N=10 with
    # ~1e-4 N precision-tier spread): a silent precision regression in either
    # path now fails the bench instead of shipping.
    kerr = np.abs(force1 - force[0]).max()
    assert kerr < 0.01, f"riccati_pallas vs scan GRF mismatch: {kerr} N"

    # ---- batch-1 warm MPC tick (the 50 Hz loop) ----------------------------
    rti = ScpSettings(iterations=1, ipm=IpmSettings(iters=6),
                      qp_backend='riccati_pallas')
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
    dog.pet("warm ticks")
    assert np.isfinite(np.asarray(force_w)).all()

    # ---- on-device multi-tick MPC loop (dispatch amortization) -------------
    # One host dispatch covers n_ticks warm-started RTI replans + plant
    # steps (lax.scan on device, plant == model). On a degraded relay the
    # per-solve wall numbers above are dispatch-bound; this is the
    # framework's real-time mitigation: the wall-clock replanning rate of
    # the fused loop is n_ticks / wall, with one relay round trip total.
    from cheeta_mpc_tpu.mpc.centroidal_mpc import build_centroidal_mpc_loop
    n_ticks = 20
    loop_scp = ScpSettings(iterations=1, ipm=IpmSettings(iters=6),
                           qp_backend='riccati_pallas')
    dins_st = np.asarray(i1).copy()
    for li in range(4):  # all-stance hold command for the loop scenario
        dins_st[li * (4 * horizon + 3):li * (4 * horizon + 3) + horizon] = 1.0
    loop_fn = jax.jit(build_centroidal_mpc_loop(cfg, loop_scp,
                                                n_ticks=n_ticks))
    largs_loop = (jnp.asarray(s1, cfg.dtype), jnp.asarray(d1, cfg.dtype),
                  jnp.asarray(dins_st, cfg.dtype))
    xs_l, fs_l = loop_fn(*largs_loop)
    np.asarray(fs_l)
    print("# on-device mpc loop compiled", flush=True)
    dog.pet("mpc loop")
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        xs_l, fs_l = loop_fn(*largs_loop)
        np.asarray(fs_l)
        lat.append((time.perf_counter() - t0) * 1e3)
    loop_p50 = float(np.percentile(np.asarray(lat), 50))
    closed_loop_hz = n_ticks / (loop_p50 / 1e3)
    fs_l = np.asarray(fs_l)
    assert np.isfinite(fs_l).all()
    # Weight support holds on every tick of the closed loop.
    fz_l = fs_l[:, :, 2].sum(axis=1)
    assert (np.abs(fz_l - 78.48) < 0.1 * 78.48).all(), fz_l

    # ---- reference-scale legged task (N=67, task.info) ---------------------
    from cheeta_mpc_tpu.mpc.legged_mpc import (LeggedMpcConfig,
                                               build_legged_solver)
    lcfg = LeggedMpcConfig.from_task_info(
        "/root/reference/ocs2_legged_robot/config/mpc/task.info",
        cone_mode='soft', dtype=jnp.float32)  # horizon = 1.0 s / 0.015 = 67
    # RTI (task.info:34) with the fused Pallas eq-Riccati kernel — the
    # full backward/forward pass is one kernel, ~0.7 ms of device time.
    lsolve_nj = build_legged_solver(
        lcfg, ScpSettings(iterations=1, ipm=IpmSettings(eq_backend='pallas')))
    lsolve = jax.jit(lsolve_nj)
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
    print("# legged eq-pallas compiled", flush=True)
    dog.pet("legged kernel")
    leg_p50, leg_p99 = _percentiles(f_leg, largs, 30)
    assert np.isfinite(lf).all()
    dev_leg_s = device_time_per_call(lambda *a: lsolve_nj(*a).forces, largs)
    dog.pet("legged device time")

    # ---- legged PYRAMID-cone mode: 16 eq + 20 ineq rows in ONE fused IPM
    # kernel (round-5 extension; HPIPM's single native IPM handling both row
    # types, HpipmInterface.cpp:223-264). Batch-1 real-time path + oracle.
    lcfg_pyr = LeggedMpcConfig.from_task_info(
        "/root/reference/ocs2_legged_robot/config/mpc/task.info",
        cone_mode='pyramid', dtype=jnp.float32)
    pyr_scp = ScpSettings(iterations=1, ipm=IpmSettings(iters=10),
                          qp_backend='riccati_pallas')
    psolve_nj = build_legged_solver(lcfg_pyr, pyr_scp)
    psolve = jax.jit(psolve_nj)
    pf = np.asarray(psolve(*largs).forces)
    print("# legged pyramid ipm-pallas compiled", flush=True)
    dog.pet("pyramid kernel")
    assert np.isfinite(pf).all()
    dev_pyr_s = device_time_per_call(lambda *a: psolve_nj(*a).forces, largs)
    dog.pet("pyramid device time")
    # Oracle: fused kernel vs the scan IPM on the same pyramid problem.
    psolve_scan = jax.jit(build_legged_solver(
        lcfg_pyr, ScpSettings(iterations=1, ipm=IpmSettings(iters=10))))
    pf_s = np.asarray(psolve_scan(*largs).forces)
    dog.pet("pyramid scan oracle")
    perr = np.abs(pf - pf_s).max()
    assert perr < 0.2, f"pyramid kernel vs scan force mismatch: {perr} N"

    # ---- batched legged throughput (BASELINE config 4 at fleet scale) ------
    lbatch = 512
    # Fleet config at matmul_precision='high': 0.06 N force delta vs the
    # 'highest' floor at N=67 (~0.02% of stance forces), documented in PERF.
    lsolve_b = jax.jit(jax.vmap(build_legged_solver(
        lcfg, ScpSettings(iterations=1, ipm=IpmSettings(eq_backend='scan'),
                          matmul_precision='high'))))
    x0b = np.tile(x0l, (lbatch, 1)).astype(np.float32)
    x0b[:, 0] += 0.05 * np.random.default_rng(0).standard_normal(lbatch)
    x0b[0] = x0l  # element 0 = the batch-1 scenario (scan-path oracle)
    bargs = (jnp.asarray(x0b),
             jnp.asarray(np.repeat(x0b[:, None, :], NL_ + 1, axis=1)),
             jnp.asarray(np.tile(enable, (lbatch, 1, 1))),
             jnp.asarray(np.tile(zp, (lbatch, 1, 1))),
             jnp.asarray(np.tile(zv, (lbatch, 1, 1))))
    lfb = np.asarray(lsolve_b(*bargs).forces)
    dog.pet("batched legged")
    assert np.isfinite(lfb).all()
    # ---- on-TPU oracle: compiled eq-Riccati kernel vs the scan path --------
    # (batch element 0 of the batched scan solve is the same scenario.)
    # ~3x the measured error (r04: 0.061 N at N=67, the 'high'-precision
    # batched path vs the HIGHEST-pinned kernel).
    lerr = np.abs(lf - lfb[0]).max()
    assert lerr < 0.2, f"eq-Riccati pallas vs scan force mismatch: {lerr} N"
    # p50 of per-rep batch latency (not a plain mean): robust to the known
    # large transport variance of the axon relay.
    lb_p50, _ = _percentiles(lambda *a: lsolve_b(*a).forces, bargs, 9)
    leg_batch_scan_sps = lbatch / (lb_p50 / 1e3)

    # ---- batched legged via the FLEET eq-Riccati kernel (round 5) ----------
    # eq_backend='pallas' under vmap dispatches the lane-batched streaming
    # kernel (ops/pallas_eq_batch.py): the N=67 QP drops 83.6 -> 1.2 ms
    # device per 512-batch (68x); end-to-end the solver is then bound by
    # the XLA linearization/line-search fusions (PERF.md round-5 section).
    # Sweet spot is ONE 128-lane tile per solve call.
    lbatch_f = 128
    lsolve_bf_nj = jax.vmap(build_legged_solver(
        lcfg, ScpSettings(iterations=1, ipm=IpmSettings(eq_backend='pallas'),
                          matmul_precision='high')))
    lsolve_bf = jax.jit(lambda *a: lsolve_bf_nj(*a).forces)
    bargs_f = tuple(a[:lbatch_f] for a in bargs)
    lff = np.asarray(lsolve_bf(*bargs_f))
    dog.pet("batched legged fleet")
    assert np.isfinite(lff).all()
    # Whole-tile cross-executor oracle vs the scan batch (same scenarios).
    flerr = np.abs(lff - lfb[:lbatch_f]).max()
    assert flerr < 0.2, f"fleet eq kernel vs scan forces: {flerr} N"
    lbf_p50, _ = _percentiles(lambda *a: lsolve_bf(*a), bargs_f, 9)
    leg_fleet_wall_sps = lbatch_f / (lbf_p50 / 1e3)
    dev_legb_s = device_time_per_call(
        lambda *a: lsolve_bf_nj(*a).forces, bargs_f, k_small=2, k_big=8)
    leg_fleet_dev_sps = lbatch_f / dev_legb_s
    dog.pet("batched legged fleet device time")
    leg_batch_sps = max(leg_batch_scan_sps, leg_fleet_wall_sps)

    # ---- on-TPU f32 structural tier ----------------------------------------
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

    # Headline = the better of the two batched executors by wall clock.
    head_sps = max(solves_per_s, fleet_wall_sps)
    result = {
        "metric": f"centroidal_mpc_solves_per_s_chip_N{horizon}",
        "value": round(head_sps, 1),
        "unit": "solves/s",
        "vs_baseline": round(head_sps / 625.0, 3),
        "scan_wall_solves_per_s": round(solves_per_s, 1),
        "fleet_wall_solves_per_s": round(fleet_wall_sps, 1),
        "fleet_device_ms": round(dev_fleet_s * 1e3, 2),
        "fleet_device_solves_per_s": round(fleet_sps, 1),
        "fleet_mfu_pct": round(100.0 * mfu_fleet, 3),
        "fleet_vs_scan_grf_err_N": round(float(ferr), 4),
        "batch": batch,
        "batch_latency_ms": round(dt_s * 1e3, 3),
        "batch_device_ms": round(dev_batch_s * 1e3, 2),
        "device_solves_per_s": round(dev_solves_per_s, 1),
        "batch_matmul_precision": "high",
        "mfu_pct": round(100.0 * mfu, 3),
        "flops_per_solve_M": round(flops_per_solve / 1e6, 1),
        "batch1_cold_p50_ms": cold_p50,
        "batch1_cold_p99_ms": cold_p99,
        "batch1_device_ms": round(dev_b1_s * 1e3, 3),
        "batch1_warm_p50_ms": warm_p50,
        "batch1_warm_p99_ms": warm_p99,
        "dispatch_floor_ms": round(dispatch_floor_ms, 2),
        "closed_loop_ticks": n_ticks,
        "closed_loop_wall_ms": round(loop_p50, 2),
        "closed_loop_hz": round(closed_loop_hz, 1),
        "legged_N": int(NL_),
        "legged_p50_ms": leg_p50,
        "legged_p99_ms": leg_p99,
        "legged_device_ms": round(dev_leg_s * 1e3, 3),
        "legged_pyr_device_ms": round(dev_pyr_s * 1e3, 3),
        "pyr_kernel_vs_scan_err_N": round(float(perr), 4),
        "legged_solves_per_s_chip_N67": round(1000.0 / leg_p50, 1),
        "legged_batch_solves_per_s_chip_N67": round(leg_batch_sps, 1),
        "legged_batch_scan_solves_per_s": round(leg_batch_scan_sps, 1),
        "legged_fleet_wall_solves_per_s": round(leg_fleet_wall_sps, 1),
        "legged_fleet_device_ms": round(dev_legb_s * 1e3, 2),
        "legged_fleet_device_solves_per_s": round(leg_fleet_dev_sps, 1),
        "legged_fleet_batch": lbatch_f,
        "legged_batch": lbatch,
        "kernel_vs_scan_grf_err_N": round(float(kerr), 4),
        "eq_kernel_vs_scan_force_err_N": round(float(lerr), 4),
        "eq_fleet_vs_scan_force_err_N": round(float(flerr), 4),
        "f32_tier": "pass",
        "tpu_selftest": "pass",
        "device": str(jax.devices()[0]),
    }
    dog.disarm()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
