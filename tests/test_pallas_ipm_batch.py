"""Lane-batched fleet IPM kernel: equivalence with the scan-based solver.

The batched kernel (ops/pallas_ipm_batch.py) is the third executor of the
same fixed-iteration Mehrotra algorithm (after the scan path and the batch-1
fused kernel); on any in-scope problem batch it must agree with
``jax.vmap(solve_ocp_qp)`` per element. Runs in Pallas interpret mode on CPU
CI; the TPU compiled path is exercised by bench.py's fleet oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cheeta_mpc_tpu.core.types import StageConstraint
from cheeta_mpc_tpu.ops.ocpqp import IpmSettings, solve_ocp_qp
from cheeta_mpc_tpu.ops.pallas_ipm_batch import (LANE_B, make_fleet_qp_solver,
                                                 solve_ocp_qp_fleet)
from tests.problem_gen import random_lq_problem

SETTINGS = IpmSettings(iters=12)


def _shared_cd_batch(seed, batch, N=4, nx=5, nu=3, ng=4, tight=0.6):
    """Batch of random LQ problems sharing constraint matrices C/D (the
    fleet workload shape: pyramid/box rows are config constants; only the
    bounds and masks vary per scenario). Bounds are placed around each
    problem's UNCONSTRAINED optimum so the batch is feasible by
    construction and the IPM converges inside the iteration budget —
    unconverged mid-flight iterates would compare executor noise, not
    solutions."""
    from cheeta_mpc_tpu.ops.riccati import solve_lqr
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(N + 1, ng, nx)).astype(np.float32)
    D = rng.normal(size=(N + 1, ng, nu)).astype(np.float32)
    D[-1] = 0.0

    datas = []
    for b in range(batch):
        d = random_lq_problem(rng, N, nx, nu, dtype=np.float32)
        sol = solve_lqr(d.replace(con=None))
        du_pad = np.concatenate([np.asarray(sol.du),
                                 np.zeros((1, nu), np.float32)])
        g_ref = (np.einsum('nij,nj->ni', C, np.asarray(sol.dx))
                 + np.einsum('nij,nj->ni', D, du_pad)).astype(np.float32)
        lo = (g_ref - tight * rng.uniform(0.1, 1.0, (N + 1, ng))
              ).astype(np.float32)
        hi = (g_ref + tight * rng.uniform(0.1, 1.0, (N + 1, ng))
              ).astype(np.float32)
        mask = (rng.uniform(size=(N + 1, ng)) < 0.9).astype(np.float32)
        con = StageConstraint(C=jnp.asarray(C), D=jnp.asarray(D),
                              lg=jnp.asarray(lo), ug=jnp.asarray(hi),
                              mask=jnp.asarray(mask))
        datas.append(d.replace(con=con))
    # Stack batch-leading (C/D stacked too for the vmap reference).
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    return datas, stacked


@pytest.mark.slow
def test_fleet_kernel_matches_vmapped_scan():
    batch = LANE_B
    datas, stacked = _shared_cd_batch(51, batch)
    # Fleet kernel wants shared C/D (unbatched leaves).
    shared = stacked.replace(con=stacked.con.replace(
        C=datas[0].con.C, D=datas[0].con.D))
    sol_f = solve_ocp_qp_fleet(shared, SETTINGS, interpret=True)
    sol_v = jax.jit(jax.vmap(lambda d: solve_ocp_qp(d, SETTINGS)))(stacked)
    # Same algorithm, two executors: agreement bounded by f32 factorization
    # roundoff along the iteration path + the kernel's bf16 factor storage.
    du_err = np.abs(np.asarray(sol_f.du) - np.asarray(sol_v.du)).max()
    dx_err = np.abs(np.asarray(sol_f.dx) - np.asarray(sol_v.dx)).max()
    assert du_err < 2e-2, du_err
    assert dx_err < 2e-2, dx_err
    lam_err = np.abs(np.asarray(sol_f.lam_l)
                     - np.asarray(sol_v.lam_l)).max()
    assert lam_err < 5e-2, lam_err
    # Gains are intentionally NaN (the fleet path must not consume them).
    assert np.isnan(np.asarray(sol_f.gains.K)).all()
    # mu per problem, finite and small-ish after 12 iterations.
    assert np.isfinite(np.asarray(sol_f.mu)).all()


@pytest.mark.slow
def test_centroidal_fleet_backend_end_to_end():
    """The vmapped centroidal solver with qp_backend='riccati_pallas'
    dispatches to the fleet kernel and matches the scan backend on GRFs —
    the bench.py fleet configuration, in interpret mode."""
    from cheeta_mpc_tpu.examples import TEST_WEIGHTS, make_example_inputs
    from cheeta_mpc_tpu.mpc.centroidal_mpc import (CentroidalMpcConfig,
                                                   build_centroidal_solver)
    from cheeta_mpc_tpu.solvers.scp import ScpSettings

    cfg = CentroidalMpcConfig(mass=8.0, num_legs=4, horizon=4, dt=0.01,
                              weights=tuple(TEST_WEIGHTS), mu=(0.8,) * 4,
                              dtype=jnp.float32)
    batch = LANE_B
    state, des, dins = make_example_inputs(cfg, batch=batch)
    args = tuple(jnp.asarray(a, jnp.float32) for a in (state, des, dins))
    outs = {}
    for backend in ('riccati', 'riccati_pallas'):
        solve = jax.vmap(build_centroidal_solver(
            cfg, ScpSettings(iterations=2, ipm=IpmSettings(iters=8),
                             qp_backend=backend)))
        outs[backend] = np.asarray(jax.jit(
            lambda *a, s=solve: s(*a).contact_force)(*args))
    err = np.abs(outs['riccati_pallas'] - outs['riccati']).max()
    assert np.isfinite(outs['riccati_pallas']).all()
    # Executor tolerance: bf16-free f32 kernel vs f32 scan, converged
    # (frozen) iterates — sub-0.05 N on ~20 N stance forces.
    assert err < 0.05, err


@pytest.mark.slow
def test_fleet_qp_solver_custom_vmap_dispatch():
    """make_fleet_qp_solver: under vmap with shared-constant C/D it takes
    the fleet kernel (NaN gains are its fingerprint); per-problem C/D falls
    back to the vmapped scan path (real gains)."""
    batch = LANE_B
    datas, stacked = _shared_cd_batch(52, batch)
    qp = make_fleet_qp_solver(SETTINGS, interpret=True)

    Cs = np.asarray(datas[0].con.C)
    Ds = np.asarray(datas[0].con.D)

    def solve_with_shared_cd(dyn, cost, lg, ug, mask, dx0):
        con = StageConstraint(C=Cs, D=Ds, lg=lg, ug=ug, mask=mask)
        from cheeta_mpc_tpu.core.types import OcpQpData
        return qp(OcpQpData(dyn=dyn, cost=cost, con=con, dx0=dx0))

    sol = jax.vmap(solve_with_shared_cd)(
        stacked.dyn, stacked.cost, stacked.con.lg, stacked.con.ug,
        stacked.con.mask, stacked.dx0)
    assert np.isnan(np.asarray(sol.gains.K)).all()  # fleet kernel ran
    sol_v = jax.jit(jax.vmap(lambda d: solve_ocp_qp(d, SETTINGS)))(stacked)
    assert np.abs(np.asarray(sol.du) - np.asarray(sol_v.du)).max() < 2e-2

    # Per-problem C/D -> scan fallback with real gains.
    sol_fb = jax.vmap(lambda d: qp(d))(stacked)
    assert np.isfinite(np.asarray(sol_fb.gains.K)).all()
    assert np.abs(np.asarray(sol_fb.du) - np.asarray(sol_v.du)).max() < 1e-5
