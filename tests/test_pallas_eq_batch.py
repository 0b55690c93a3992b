"""Lane-batched fleet eq-Riccati kernel: equivalence with the scan solver
and the fused batch-1 kernel.

The streaming fleet kernel (ops/pallas_eq_batch.py) is the third executor
of the masked eq-elimination Riccati solve (after the scan path
`ops/riccati.solve_eq_lqr` and the fused batch-1 kernel
`ops/pallas_riccati.pallas_solve_eq_lqr`); on any in-scope problem batch
it must agree per element. Runs in Pallas interpret mode on CPU CI; the
TPU compiled path is exercised by tests/test_tpu_hardware.py and bench.py's
batched-legged oracle.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cheeta_mpc_tpu.core.types import StageEquality
from cheeta_mpc_tpu.ops.pallas_eq_batch import (LANE_B, make_fleet_eq_solver,
                                                solve_eq_lqr_fleet)
from cheeta_mpc_tpu.ops.riccati import solve_eq_lqr
from tests.problem_gen import random_lq_problem


def _eq_batch(seed, batch, N=5, nx=5, nu=3, nc=2):
    """Batch of random f32 LQ problems with per-problem masked stage
    equalities (inactive rows zeroed in C/D, matching the
    riccati_factorize_eq contract). Dynamics are rescaled to spectral
    radius < 1 like tests/test_pallas_riccati.py — unstabilized random
    N(0, 0.5^2) dynamics produce pathologically conditioned recursions
    where f32 GJ and Schur inverses legitimately diverge."""
    rng = np.random.default_rng(seed)
    datas = []
    for _ in range(batch):
        d = random_lq_problem(rng, N, nx, nu, dtype=np.float32)
        A = np.asarray(d.dyn.A)
        rad = np.array([np.abs(np.linalg.eigvals(a)).max() for a in A],
                       np.float32)
        A = A / np.maximum(1.0, 1.25 * rad)[:, None, None]
        d = d.replace(dyn=d.dyn.replace(A=jnp.asarray(A)))
        mask = (rng.uniform(size=(N, nc)) > 0.4).astype(np.float32)
        C = (rng.normal(size=(N, nc, nx)) * 0.5).astype(np.float32)
        # Keep D well away from row-rank deficiency (random rows can be
        # near-parallel, making Lam = D G^-1 D' singular and the eq duals
        # unbounded — there even the f32 SCAN diverges from f64 by O(100);
        # the executors can only be compared on well-posed problems).
        D = (rng.normal(size=(N, nc, nu)) * 0.5
             + 2.0 * np.eye(nc, nu)[None]).astype(np.float32)
        C *= mask[..., None]
        D *= mask[..., None]
        e = (rng.normal(size=(N, nc)) * 0.2).astype(np.float32) * mask
        datas.append(d.replace(eq=StageEquality(
            C=jnp.asarray(C), D=jnp.asarray(D), e=jnp.asarray(e),
            mask=jnp.asarray(mask))))
    stacked = jax.tree.map(
        lambda *xs: None if xs[0] is None else jnp.stack(xs), *datas,
        is_leaf=lambda x: x is None)
    return datas, stacked


@pytest.mark.slow
def test_eq_fleet_matches_scan_and_batch1_kernel():
    batch = LANE_B
    datas, stacked = _eq_batch(7, batch)
    sol_f = solve_eq_lqr_fleet(stacked, reg=1e-7, interpret=True)

    # Scan-path reference: same solve, recursive-Schur inverses. Agreement
    # is bounded by f32 inverse roundoff (GJ vs Schur), not by the kernel.
    sol_v = jax.jit(jax.vmap(lambda d: solve_eq_lqr(d, reg=1e-7)))(stacked)
    assert np.abs(np.asarray(sol_f.dx) - np.asarray(sol_v.dx)).max() < 5e-3
    assert np.abs(np.asarray(sol_f.du) - np.asarray(sol_v.du)).max() < 5e-3
    assert (np.abs(np.asarray(sol_f.gains.K)
                   - np.asarray(sol_v.gains.K)).max() < 5e-3)

    # Batch-1 fused kernel: identical GJ algebra -> near-exact agreement
    # (the executor-equivalence statement; measured ~7e-6 on this batch).
    from cheeta_mpc_tpu.ops.pallas_riccati import pallas_solve_eq_lqr
    for i in (0, 3, LANE_B - 1):
        o1 = pallas_solve_eq_lqr(datas[i], reg=1e-7, interpret=True)
        assert np.abs(np.asarray(sol_f.dx[i])
                      - np.asarray(o1.dx)).max() < 1e-4
        assert np.abs(np.asarray(sol_f.du[i])
                      - np.asarray(o1.du)).max() < 1e-4
        assert np.abs(np.asarray(sol_f.gains.K[i])
                      - np.asarray(o1.gains.K)).max() < 1e-4

    # P/p are NaN by design (only K/k are produced by the fleet path).
    assert np.isnan(np.asarray(sol_f.gains.P)).all()
    # Dynamic feasibility certified by the returned residual.
    assert np.asarray(sol_f.eq_res).max() < 1e-4


@pytest.mark.slow
def test_eq_fleet_custom_vmap_dispatch():
    """make_fleet_eq_solver: vmap -> fleet kernel (NaN P fingerprint);
    direct call -> the batch-1 fused kernel (real P); out-of-scope batch
    size -> vmapped scan fallback with a trace-time warning."""
    datas, stacked = _eq_batch(8, LANE_B)
    eqs = make_fleet_eq_solver(reg=1e-7, interpret=True)

    sol_b = jax.vmap(eqs)(stacked)
    assert np.isnan(np.asarray(sol_b.gains.P)).all()  # fleet kernel ran

    sol_1 = eqs(datas[0])  # direct -> batch-1 kernel, real value function
    assert np.isfinite(np.asarray(sol_1.gains.P)).all()
    assert np.abs(np.asarray(sol_b.du[0]) - np.asarray(sol_1.du)).max() < 1e-4

    # Batch not divisible by LANE_B -> scan fallback, loudly.
    small = jax.tree.map(lambda x: None if x is None else x[:3], stacked,
                         is_leaf=lambda x: x is None)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sol_fb = jax.vmap(eqs)(small)
        assert any("out of scope" in str(x.message) for x in w)
    assert np.isfinite(np.asarray(sol_fb.gains.P)).all()  # scan: real P
    sol_v3 = jax.vmap(lambda d: solve_eq_lqr(d, reg=1e-7))(small)
    assert np.abs(np.asarray(sol_fb.du) - np.asarray(sol_v3.du)).max() < 1e-6


@pytest.mark.slow
def test_legged_batched_pallas_backend_end_to_end():
    """The vmapped legged solver with eq_backend='pallas' dispatches to the
    fleet kernel and matches the scan backend on forces — the bench.py
    batched-legged configuration, in interpret mode at a reduced horizon."""
    from cheeta_mpc_tpu.mpc.legged_mpc import (LeggedMpcConfig,
                                               build_legged_solver)
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.solvers.scp import ScpSettings

    cfg = LeggedMpcConfig.from_task_info(
        "/root/reference/ocs2_legged_robot/config/mpc/task.info",
        cone_mode='soft', dtype=jnp.float32, horizon=8)
    N = cfg.horizon
    batch = LANE_B
    x0 = np.zeros(24, np.float32)
    x0[8] = 0.3
    x0[12:] = [0., 0.4, -0.8, 0., -0.4, 0.8, 0., 0.4, -0.8, 0., -0.4, 0.8]
    rng = np.random.default_rng(0)
    x0b = np.tile(x0, (batch, 1)).astype(np.float32)
    x0b[:, 0] += 0.05 * rng.standard_normal(batch)
    enable = np.ones((N, 4), np.float32)
    enable[::2, 1] = 0.0
    enable[::2, 2] = 0.0
    args = (jnp.asarray(x0b),
            jnp.asarray(np.repeat(x0b[:, None, :], N + 1, axis=1)),
            jnp.asarray(np.tile(enable, (batch, 1, 1))),
            jnp.zeros((batch, N, 4), jnp.float32),
            jnp.zeros((batch, N, 4), jnp.float32))
    outs = {}
    for backend in ('scan', 'pallas'):
        solve = jax.vmap(build_legged_solver(
            cfg, ScpSettings(iterations=1,
                             ipm=IpmSettings(eq_backend=backend))))
        outs[backend] = np.asarray(
            jax.jit(lambda *a, s=solve: s(*a).forces)(*args))
    assert np.isfinite(outs['pallas']).all()
    err = np.abs(outs['pallas'] - outs['scan']).max()
    # Executor tolerance at N=8 (bench asserts 0.2 N at the full N=67).
    assert err < 0.05, err
