"""Fused Pallas eq-Riccati kernel vs the scan implementation.

Runs the kernel in Pallas interpreter mode on CPU (bit-accurate semantics of
the TPU kernel) and compares against :func:`solve_eq_lqr` on random
equality-constrained LQ problems in f32 — including masked (inactive) rows
and the legged problem dimensions (nx = nu = 24, nc = 16, N = 67).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cheeta_mpc_tpu.core.types import StageEquality
from cheeta_mpc_tpu.ops.pallas_riccati import _gj_inverse, pallas_solve_eq_lqr
from cheeta_mpc_tpu.ops.riccati import solve_eq_lqr
from tests.problem_gen import random_lq_problem


def _stabilize(data, rng):
    """Rescale A to spectral radius < 1: random N(0, 0.5^2) dynamics explode
    at nx = 24 (||A|| ~ 2.4), which is numerically meaningless in f32 for
    any solver. Real discretized dynamics have ||A|| ~ 1."""
    nx = data.dyn.nx
    A = np.asarray(data.dyn.A, np.float64)
    A = A * (0.9 / (0.5 * np.sqrt(nx)))
    return data.replace(dyn=data.dyn.replace(A=jnp.asarray(A, jnp.float32)))


def _with_eq(data, rng, nc, active=0.7):
    N = data.dyn.horizon
    nx, nu = data.dyn.nx, data.dyn.nu
    mask = (rng.random((N, nc)) < active).astype(np.float32)
    C = rng.standard_normal((N, nc, nx)).astype(np.float32) * mask[:, :, None]
    D = rng.standard_normal((N, nc, nu)).astype(np.float32) * mask[:, :, None]
    e = 0.1 * rng.standard_normal((N, nc)).astype(np.float32) * mask
    eq = StageEquality(C=jnp.asarray(C), D=jnp.asarray(D), e=jnp.asarray(e),
                       mask=jnp.asarray(mask))
    return data.replace(eq=eq)


def _to_f32(data):
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), data)


def _to_f64(data):
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), data)


def test_gj_inverse():
    rng = np.random.default_rng(0)
    for n in (3, 16, 24):
        M = rng.standard_normal((n, n)).astype(np.float32)
        M = M @ M.T + n * np.eye(n, dtype=np.float32)
        inv = np.asarray(_gj_inverse(jnp.asarray(M)))
        np.testing.assert_allclose(inv @ M, np.eye(n), atol=5e-4)


@pytest.mark.parametrize("seed,N,nx,nu,nc", [
    (0, 5, 4, 3, 2),
    (1, 8, 6, 5, 3),
    (2, 12, 24, 24, 16),  # legged dimensions
])
def test_pallas_matches_scan(seed, N, nx, nu, nc):
    rng = np.random.default_rng(seed)
    data = _to_f32(random_lq_problem(rng, N=N, nx=nx, nu=nu,
                                     dtype=np.float32))
    data = _stabilize(data, rng)
    data = _with_eq(data, rng, nc)
    # f64 reference: the scan path itself can lose precision in f32 on
    # ill-conditioned random instances; the oracle is the f64 solve.
    ref = solve_eq_lqr(_to_f64(data), reg=1e-7)
    sol = pallas_solve_eq_lqr(data, reg=1e-7, interpret=True)
    assert np.isfinite(np.asarray(sol.du)).all()
    scale = max(1.0, float(np.abs(np.asarray(ref.du)).max()))
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(ref.du),
                               atol=5e-3 * scale)
    scale_x = max(1.0, float(np.abs(np.asarray(ref.dx)).max()))
    np.testing.assert_allclose(np.asarray(sol.dx), np.asarray(ref.dx),
                               atol=5e-3 * scale_x)
    # Apples-to-apples: the f32 *scan* solver's own error vs the f64 oracle
    # bounds what f32 arithmetic can deliver; the kernel must be comparable.
    scan32 = solve_eq_lqr(data, reg=1e-7)
    if np.isfinite(np.asarray(scan32.du)).all():
        err_scan = np.abs(np.asarray(scan32.du) - np.asarray(ref.du)).max()
        err_kern = np.abs(np.asarray(sol.du) - np.asarray(ref.du)).max()
        assert err_kern < 10 * max(err_scan, 1e-4 * scale)
    np.testing.assert_allclose(np.asarray(sol.gains.K),
                               np.asarray(ref.gains.K), atol=2e-2)
    P0 = np.asarray(ref.gains.P[0])
    np.testing.assert_allclose(np.asarray(sol.gains.P[0]), P0,
                               atol=5e-3 * max(1.0, np.abs(P0).max()))


def test_pallas_legged_scale_n67():
    """The reference-scale problem (N=67) through the fused kernel."""
    rng = np.random.default_rng(5)
    data = _to_f32(random_lq_problem(rng, N=67, nx=24, nu=24,
                                     dtype=np.float32))
    data = _stabilize(data, rng)
    data = _with_eq(data, rng, 16, active=0.6)
    ref = solve_eq_lqr(_to_f64(data), reg=1e-7)
    sol = pallas_solve_eq_lqr(data, reg=1e-7, interpret=True)
    assert np.isfinite(np.asarray(sol.du)).all()
    scale = max(1.0, float(np.abs(np.asarray(ref.du)).max()))
    err_kern = np.abs(np.asarray(sol.du) - np.asarray(ref.du)).max()
    # Criterion: comparable f32 accuracy to the scan solver (both accumulate
    # rounding over 67 sequential stages vs the f64 oracle).
    scan32 = solve_eq_lqr(data, reg=1e-7)
    scan_du = np.asarray(scan32.du)
    if np.isfinite(scan_du).all():
        err_scan = np.abs(scan_du - np.asarray(ref.du)).max()
        assert err_kern < max(3 * err_scan, 3e-2 * scale), (err_kern,
                                                            err_scan)
    else:
        # The f32 scan solver itself produces NaNs on this instance — the
        # fused kernel (Gauss-Jordan with regularized pivots) is *more*
        # robust; require a few-percent-relative f32 result.
        assert err_kern < 3e-2 * scale, err_kern


def test_legged_solver_with_pallas_backend():
    """The soft-cone legged task solved with eq_backend='pallas' matches the
    scan backend on the real (well-conditioned) problem."""
    import jax
    from cheeta_mpc_tpu.mpc.legged_mpc import (LeggedMpcConfig,
                                               build_legged_solver,
                                               make_standing_reference)
    from cheeta_mpc_tpu.models.quadruped_kinematics import \
        foot_positions_world
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.solvers.scp import ScpSettings

    N = 8
    cfg = LeggedMpcConfig.from_task_info(
        "/root/reference/ocs2_legged_robot/config/mpc/task.info",
        horizon=N, cone_mode='soft', dtype=jnp.float32)
    joints = np.array([0., 0.4, -0.8, 0., -0.4, 0.8,
                       0., 0.4, -0.8, 0., -0.4, 0.8])
    feet_b = np.asarray(foot_positions_world(
        cfg.params.desc, jnp.zeros(3), jnp.zeros(3), jnp.asarray(joints)))
    x0 = np.zeros(24, np.float32)
    x0[8] = -feet_b[:, 2].mean()
    x0[12:] = joints
    x_ref = make_standing_reference(cfg, x0).astype(np.float32)
    enable = np.ones((N, 4), np.float32)
    enable[::2, 1] = 0.0
    enable[::2, 2] = 0.0
    zp = np.zeros((N, 4), np.float32)
    zv = np.zeros((N, 4), np.float32)
    args = tuple(jnp.asarray(a) for a in (x0, x_ref, enable, zp, zv))

    s_scan = jax.jit(build_legged_solver(cfg, ScpSettings(iterations=1)))
    s_pal = jax.jit(build_legged_solver(
        cfg, ScpSettings(iterations=1,
                         ipm=IpmSettings(eq_backend='pallas'))))
    f_scan = np.asarray(s_scan(*args).forces)
    f_pal = np.asarray(s_pal(*args).forces)
    assert np.isfinite(f_pal).all()
    scale = max(1.0, np.abs(f_scan).max())
    np.testing.assert_allclose(f_pal, f_scan, atol=2e-3 * scale)
