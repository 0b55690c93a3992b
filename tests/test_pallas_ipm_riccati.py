"""Fused Riccati-IPM Pallas kernel: equivalence with the scan-based solver.

The kernel (ops/pallas_ipm_riccati.py) implements the exact same fixed-
iteration Mehrotra predictor-corrector as ops/ocpqp.solve_ocp_qp — same
init, same barrier algebra, same freeze/guard semantics, but with the whole
loop VMEM-resident in one pallas_call — so on any f32 inequality-constrained
problem the two must produce matching primal/dual solutions, and both must
certify via the KKT oracle. Runs in Pallas interpret mode on CPU CI; the TPU
compiled path is exercised by ``bench.py --selftest``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cheeta_mpc_tpu.ops.ocpqp import IpmSettings, kkt_residuals, solve_ocp_qp
from cheeta_mpc_tpu.ops.pallas_ipm_riccati import pallas_solve_ocp_qp
from tests.problem_gen import add_random_constraints, random_lq_problem

SETTINGS = IpmSettings(iters=20)


def _to_f32(data):
    return jax.tree.map(
        lambda x: x.astype(jnp.float32) if hasattr(x, 'astype') else x, data)


def test_kernel_matches_scan_solver():
    """Same algorithm, two executors: equivalence in f32."""
    rng = np.random.default_rng(31)
    for trial in range(3):
        data = random_lq_problem(rng, N=8, nx=5, nu=3)
        data = add_random_constraints(rng, data, ng=4, tight=0.4)
        d32 = _to_f32(data)
        sol_p = pallas_solve_ocp_qp(d32, SETTINGS, interpret=True)
        sol_x = solve_ocp_qp(d32, SETTINGS)
        # Identical algorithm in identical precision; the only difference is
        # factorization roundoff (in-kernel Gauss-Jordan vs the scan path's
        # Schur-recursive SPD inverse), compounding over the iteration path.
        np.testing.assert_allclose(np.asarray(sol_p.du),
                                   np.asarray(sol_x.du), atol=2e-3)
        np.testing.assert_allclose(np.asarray(sol_p.dx),
                                   np.asarray(sol_x.dx), atol=2e-3)
        np.testing.assert_allclose(np.asarray(sol_p.lam_l),
                                   np.asarray(sol_x.lam_l), atol=5e-3)
        np.testing.assert_allclose(np.asarray(sol_p.gains.K),
                                   np.asarray(sol_x.gains.K), atol=2e-2)


def test_kernel_against_f64_riccati():
    """The fused kernel's f32 solve lands near the f64 optimum and
    certifies on the KKT oracle."""
    rng = np.random.default_rng(32)
    data = random_lq_problem(rng, N=10, nx=6, nu=4)
    data = add_random_constraints(rng, data, ng=5, tight=0.3)
    ref = solve_ocp_qp(data, IpmSettings(iters=30))
    sol = pallas_solve_ocp_qp(_to_f32(data), SETTINGS, interpret=True)
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(ref.du),
                               atol=2e-2)
    res = jax.tree.map(float, kkt_residuals(_to_f32(data), sol))
    assert res['ineq_primal'] < 1e-3, res
    assert res['complementarity'] < 1e-2, res
    assert res['dynamics'] < 1e-3, res


def test_kernel_with_stage_equalities_matches_scan():
    """The round-5 extension: masked stage equalities eliminated inside the
    fused kernel (the legged pyramid-cone shape: equalities + hard
    inequalities in one IPM, HPIPM's HpipmInterface.cpp:223-264 role)."""
    from cheeta_mpc_tpu.core.types import StageEquality
    rng = np.random.default_rng(41)
    for trial in range(3):
        N, nx, nu, nc = 8, 5, 4, 2
        data = random_lq_problem(rng, N=N, nx=nx, nu=nu)
        Ceq = rng.normal(size=(N, nc, nx))
        Deq = rng.normal(size=(N, nc, nu)) + 1.5 * np.eye(nc, nu)[None]
        e = rng.normal(size=(N, nc)) * 0.1
        mask = (rng.uniform(size=(N, nc)) < 0.7).astype(np.float64)
        eq = StageEquality(C=jnp.asarray(Ceq * mask[:, :, None]),
                           D=jnp.asarray(Deq * mask[:, :, None]),
                           e=jnp.asarray(e * mask), mask=jnp.asarray(mask))
        # Feasible-by-construction inequalities around the eq-constrained
        # optimum so the combined IPM converges cleanly.
        from cheeta_mpc_tpu.ops.riccati import solve_eq_lqr
        eq_sol = solve_eq_lqr(data.replace(eq=eq))
        data = add_random_constraints(
            rng, data, ng=3, tight=0.6,
            ref=(np.asarray(eq_sol.dx), np.asarray(eq_sol.du)))
        data = data.replace(eq=eq)
        d32 = _to_f32(data)
        sol_p = pallas_solve_ocp_qp(d32, SETTINGS, interpret=True)
        sol_x = solve_ocp_qp(d32, SETTINGS)
        np.testing.assert_allclose(np.asarray(sol_p.du),
                                   np.asarray(sol_x.du), atol=2e-3)
        np.testing.assert_allclose(np.asarray(sol_p.dx),
                                   np.asarray(sol_x.dx), atol=2e-3)
        # Equality rows hold at the kernel's solution.
        r_eq = (np.einsum('kij,kj->ki', np.asarray(eq.C),
                          np.asarray(sol_p.dx[:-1]))
                + np.einsum('kij,kj->ki', np.asarray(eq.D),
                            np.asarray(sol_p.du))
                + np.asarray(eq.e)) * mask
        assert np.abs(r_eq).max() < 1e-3
        # Gains from the eq-eliminated factorization match the scan path.
        np.testing.assert_allclose(np.asarray(sol_p.gains.K),
                                   np.asarray(sol_x.gains.K), atol=2e-2)


def test_kernel_f64_falls_back_to_scan():
    """f64 problems must not be silently downcast."""
    rng = np.random.default_rng(33)
    data = random_lq_problem(rng, N=5, nx=4, nu=3)
    data = add_random_constraints(rng, data, ng=3, tight=0.5)
    sol = pallas_solve_ocp_qp(data, SETTINGS, interpret=True)
    assert sol.du.dtype == jnp.float64
    res = jax.tree.map(float, kkt_residuals(data, sol))
    assert res['stationarity'] < 1e-5, res


def test_legged_pyramid_riccati_pallas_backend():
    """The legged PYRAMID-cone mode (16 stage equalities + 20 hard pyramid
    rows) runs end-to-end on the fused kernel — the round-5 eq extension —
    and matches the scan backend on forces."""
    from cheeta_mpc_tpu.mpc.legged_mpc import (LeggedMpcConfig,
                                               build_legged_solver)
    from cheeta_mpc_tpu.solvers.scp import ScpSettings

    cfg = LeggedMpcConfig.from_task_info(
        "/root/reference/ocs2_legged_robot/config/mpc/task.info",
        horizon=10, cone_mode='pyramid', dtype=jnp.float32)
    N = cfg.horizon
    x0 = np.zeros(24, np.float32)
    x0[8] = 0.3
    x0[12:] = [0., 0.4, -0.8, 0., -0.4, 0.8, 0., 0.4, -0.8, 0., -0.4, 0.8]
    x_ref = np.tile(x0, (N + 1, 1))
    enable = np.ones((N, 4), np.float32)
    enable[::2, 1] = 0.0
    enable[::2, 2] = 0.0
    zeros4 = np.zeros((N, 4), np.float32)
    args = tuple(jnp.asarray(a, jnp.float32)
                 for a in (x0, x_ref, enable, zeros4, zeros4))
    outs = {}
    for backend in ('riccati', 'riccati_pallas'):
        solve = build_legged_solver(
            cfg, ScpSettings(iterations=1, ipm=IpmSettings(iters=10),
                             qp_backend=backend))
        outs[backend] = solve(*args)
    f_s = np.asarray(outs['riccati'].forces)
    f_p = np.asarray(outs['riccati_pallas'].forces)
    assert np.all(np.isfinite(f_p))
    np.testing.assert_allclose(f_p, f_s, atol=5e-2)
    # Hard pyramid: stance normal forces nonnegative, swing forces zero.
    assert f_p[:, :, 2][enable > 0.5].min() > -1e-3
    assert np.abs(f_p[enable < 0.5]).max() == 0.0


def test_centroidal_solver_riccati_pallas_backend():
    """The north-star centroidal solve runs end-to-end on the fused kernel
    and matches the scan backend on GRFs."""
    from cheeta_mpc_tpu.examples import TEST_WEIGHTS, make_example_inputs
    from cheeta_mpc_tpu.mpc.centroidal_mpc import (CentroidalMpcConfig,
                                                   build_centroidal_solver)
    from cheeta_mpc_tpu.solvers.scp import ScpSettings

    cfg = CentroidalMpcConfig(mass=8.0, num_legs=4, horizon=6, dt=0.01,
                              weights=tuple(TEST_WEIGHTS), mu=(0.8,) * 4,
                              dtype=jnp.float32)
    state, des_state, des_inputs = make_example_inputs(cfg)
    args = tuple(jnp.asarray(a, jnp.float32)
                 for a in (state, des_state, des_inputs))
    outs = {}
    for backend in ('riccati', 'riccati_pallas'):
        solve = build_centroidal_solver(
            cfg, ScpSettings(iterations=2, ipm=IpmSettings(iters=10),
                             qp_backend=backend))
        outs[backend] = solve(*args)
    f_s, f_p = (np.asarray(outs['riccati'].contact_force),
                np.asarray(outs['riccati_pallas'].contact_force))
    assert np.all(np.isfinite(f_p))
    np.testing.assert_allclose(f_p, f_s, atol=5e-2)
