"""On-TPU test tier: COMPILED Pallas kernels against the scan oracles.

Run with ``pytest tests/test_tpu_hardware.py --runtpu`` on a machine with a
real TPU (do not run concurrently with bench.py). The CPU suite certifies
the algorithms in f64 and exercises the kernels in interpret mode; this
tier is the deployment-target check — the compiled f32 kernels (Mosaic, not
the interpreter) must agree with the XLA scan path on the production
problems within the tolerances measured and documented in PERF.md:

- batch-1 Riccati-IPM kernel (centroidal N=10): <= 0.01 N GRF
  (measured 0.0 at 'high'-precision scan; ~1e-4 N precision-tier spread)
- eq-Riccati kernel (legged N=67 soft cone): <= 0.2 N
  (measured 0.061 N vs the 'high' scan; the kernel pins HIGHEST)
- eq+ineq IPM kernel (legged N=67 pyramid mode): <= 0.2 N (measured 1e-4)
- fleet kernel (batch 128, centroidal): <= 0.05 N vs the vmapped scan

Reference role: the gtest suites running on the deployment target
(ocs2_sqp/ocs2_sqp/CMakeLists.txt:102-112).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_device():
    dev = jax.devices()[0]
    if dev.platform not in ("tpu",):
        pytest.skip(f"no TPU device (got {dev.platform})")
    return dev


def _centroidal(horizon=10):
    from cheeta_mpc_tpu.examples import TEST_WEIGHTS, make_example_inputs
    from cheeta_mpc_tpu.mpc.centroidal_mpc import (CentroidalMpcConfig,
                                                   build_centroidal_solver)
    cfg = CentroidalMpcConfig(mass=8.0, num_legs=4, horizon=horizon, dt=0.01,
                              weights=tuple(TEST_WEIGHTS), mu=(0.8,) * 4,
                              dtype=jnp.float32)
    return cfg, build_centroidal_solver, make_example_inputs


def _legged_args(N):
    x0 = np.zeros(24, np.float32)
    x0[8] = 0.3
    x0[12:] = [0., 0.4, -0.8, 0., -0.4, 0.8, 0., 0.4, -0.8, 0., -0.4, 0.8]
    enable = np.ones((N, 4), np.float32)
    enable[::2, 1] = 0.0
    enable[::2, 2] = 0.0
    z = np.zeros((N, 4), np.float32)
    return tuple(jnp.asarray(a, jnp.float32)
                 for a in (x0, np.tile(x0, (N + 1, 1)), enable, z, z))


def test_compiled_batch1_ipm_kernel_vs_scan(tpu_device):
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.solvers.scp import ScpSettings
    cfg, build, make_inputs = _centroidal()
    args = tuple(jnp.asarray(a, jnp.float32) for a in make_inputs(cfg))
    f_k = jax.jit(build(cfg, ScpSettings(
        iterations=2, ipm=IpmSettings(iters=10),
        qp_backend='riccati_pallas')))
    f_s = jax.jit(build(cfg, ScpSettings(
        iterations=2, ipm=IpmSettings(iters=10), matmul_precision='high')))
    gk = np.asarray(f_k(*args).contact_force)
    gs = np.asarray(f_s(*args).contact_force)
    assert np.isfinite(gk).all()
    err = np.abs(gk - gs).max()
    assert err < 0.01, f"compiled kernel vs scan GRF: {err} N"


def test_compiled_eq_riccati_kernel_vs_scan(tpu_device):
    from cheeta_mpc_tpu.mpc.legged_mpc import (LeggedMpcConfig,
                                               build_legged_solver)
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.solvers.scp import ScpSettings
    lcfg = LeggedMpcConfig.from_task_info(
        "/root/reference/ocs2_legged_robot/config/mpc/task.info",
        cone_mode='soft', dtype=jnp.float32)
    args = _legged_args(lcfg.horizon)
    f_k = jax.jit(build_legged_solver(lcfg, ScpSettings(
        iterations=1, ipm=IpmSettings(eq_backend='pallas'))))
    f_s = jax.jit(build_legged_solver(lcfg, ScpSettings(
        iterations=1, ipm=IpmSettings(eq_backend='scan'),
        matmul_precision='high')))
    fk = np.asarray(f_k(*args).forces)
    fs = np.asarray(f_s(*args).forces)
    assert np.isfinite(fk).all()
    err = np.abs(fk - fs).max()
    assert err < 0.2, f"compiled eq-kernel vs scan forces: {err} N"


def test_compiled_pyramid_ipm_kernel_vs_scan(tpu_device):
    from cheeta_mpc_tpu.mpc.legged_mpc import (LeggedMpcConfig,
                                               build_legged_solver)
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.solvers.scp import ScpSettings
    lcfg = LeggedMpcConfig.from_task_info(
        "/root/reference/ocs2_legged_robot/config/mpc/task.info",
        cone_mode='pyramid', dtype=jnp.float32)
    args = _legged_args(lcfg.horizon)
    f_k = jax.jit(build_legged_solver(lcfg, ScpSettings(
        iterations=1, ipm=IpmSettings(iters=10),
        qp_backend='riccati_pallas')))
    f_s = jax.jit(build_legged_solver(lcfg, ScpSettings(
        iterations=1, ipm=IpmSettings(iters=10))))
    fk = np.asarray(f_k(*args).forces)
    fs = np.asarray(f_s(*args).forces)
    assert np.isfinite(fk).all()
    err = np.abs(fk - fs).max()
    assert err < 0.2, f"compiled pyramid kernel vs scan forces: {err} N"
    # Hard pyramid semantics hold on the compiled path.
    enable = np.asarray(args[2])
    assert np.abs(fk[enable < 0.5]).max() == 0.0


def test_f32_matmul_precision_guard(tpu_device):
    """Regression guard on the round-4 finding: the solver's precision
    plumbing must keep 'highest' and 'high' within the measured band at
    N=10 (~1e-4 N) — a silent fall-through to the 1-pass-bf16 default
    would show up as O(0.1-1 N) here."""
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.solvers.scp import ScpSettings
    cfg, build, make_inputs = _centroidal()
    args = tuple(jnp.asarray(a, jnp.float32) for a in make_inputs(cfg))
    outs = {}
    for prec in ('highest', 'high'):
        f = jax.jit(build(cfg, ScpSettings(
            iterations=2, ipm=IpmSettings(iters=10),
            matmul_precision=prec)))
        outs[prec] = np.asarray(f(*args).contact_force)
    err = np.abs(outs['highest'] - outs['high']).max()
    assert err < 0.01, f"precision-tier spread blew up: {err} N"


def test_compiled_fleet_kernel_vs_scan(tpu_device):
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.ops.pallas_ipm_batch import LANE_B
    from cheeta_mpc_tpu.solvers.scp import ScpSettings
    cfg, build, make_inputs = _centroidal()
    batch = LANE_B
    state, des, dins = make_inputs(cfg, batch=batch)
    args = tuple(jnp.asarray(a, jnp.float32) for a in (state, des, dins))
    f_f = jax.jit(jax.vmap(build(cfg, ScpSettings(
        iterations=2, ipm=IpmSettings(iters=10),
        qp_backend='riccati_pallas'))))
    f_s = jax.jit(jax.vmap(build(cfg, ScpSettings(
        iterations=2, ipm=IpmSettings(iters=10),
        matmul_precision='high'))))
    gk = np.asarray(f_f(*args).contact_force)
    gs = np.asarray(f_s(*args).contact_force)
    assert np.isfinite(gk).all()
    err = np.abs(gk - gs).max()
    assert err < 0.05, f"compiled fleet kernel vs scan GRF: {err} N"


def test_compiled_eq_fleet_kernel_vs_scan(tpu_device):
    """The lane-batched streaming eq-Riccati fleet kernel (round 5,
    ops/pallas_eq_batch.py), compiled, at reference scale N=67 x LANE_B
    scenarios, against the vmapped scan backend."""
    from cheeta_mpc_tpu.mpc.legged_mpc import (LeggedMpcConfig,
                                               build_legged_solver)
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.ops.pallas_eq_batch import LANE_B
    from cheeta_mpc_tpu.solvers.scp import ScpSettings
    lcfg = LeggedMpcConfig.from_task_info(
        "/root/reference/ocs2_legged_robot/config/mpc/task.info",
        cone_mode='soft', dtype=jnp.float32)
    N = lcfg.horizon
    x0, x_ref, enable, zp, zv = _legged_args(N)
    batch = LANE_B
    rng = np.random.default_rng(0)
    x0b = np.tile(np.asarray(x0), (batch, 1)).astype(np.float32)
    x0b[:, 0] += 0.05 * rng.standard_normal(batch)
    bargs = (jnp.asarray(x0b),
             jnp.broadcast_to(x_ref, (batch,) + x_ref.shape),
             jnp.broadcast_to(enable, (batch,) + enable.shape),
             jnp.broadcast_to(zp, (batch,) + zp.shape),
             jnp.broadcast_to(zv, (batch,) + zv.shape))
    f_f = jax.jit(jax.vmap(build_legged_solver(lcfg, ScpSettings(
        iterations=1, ipm=IpmSettings(eq_backend='pallas')))))
    f_s = jax.jit(jax.vmap(build_legged_solver(lcfg, ScpSettings(
        iterations=1, ipm=IpmSettings(eq_backend='scan'),
        matmul_precision='high'))))
    fk = np.asarray(f_f(*bargs).forces)
    fs = np.asarray(f_s(*bargs).forces)
    assert np.isfinite(fk).all()
    err = np.abs(fk - fs).max()
    assert err < 0.2, f"compiled eq-fleet kernel vs scan forces: {err} N"
