"""Lane-batched (fleet-scale) equality-Riccati solver: streamed problem
stages, batch on the vector lanes.

Why this exists: the batched LEGGED path (reference scale N=67, soft cone,
RTI — task.info:102,33,34) is an *equality-constrained* LQ solve per SQP
iteration (`ops/riccati.solve_eq_lqr`), and its vmapped `lax.scan` executor
pays the same tile-padding tax PERF.md's round-4 roofline diagnosed for the
IPM fleet path: with batch leading, every (512, 24, 24) stage matmul pads
its last dim 24 -> 128 lanes (5.3x traffic inflation) and round-trips HBM
per op, ~3,000 ops per solve chain. This kernel applies the
`ops/pallas_ipm_batch.py` recipe to the eq-LQR solve: 128 scenarios ride
the vector lanes, stage matrices sit on sublanes, and the whole backward +
forward recursion is ONE kernel.

Unlike the N=10 IPM fleet kernel the full N=67 problem tile (~129 MB) does
NOT fit VMEM, and unlike the IPM it doesn't need to: eq-Riccati is a
single-pass algorithm, so stage data is STREAMED — one double-buffered DMA
per stage in the backward pass (and the dynamics again in the forward
pass), with only the Riccati factors K/k (~20 MB/tile) held VMEM-resident
between the passes. HBM sees each datum once per pass at its unpadded size;
the per-stage prefetch (~2 MB, ~2.5 us at HBM speed) hides under the
~40 us of stage compute.

The algebra is EXACTLY `ops/riccati.solve_eq_lqr` (masked eq elimination
via the (D G^-1 D' + eps(1-m))^-1 Schur complement — same as the fused
batch-1 kernel `ops/pallas_riccati._eq_lqr_kernel`); cross-executor oracles
in tests/test_pallas_eq_batch.py and bench.py keep the three executors
(scan, batch-1 kernel, fleet kernel) in agreement.

Mosaic/DMA constraints inherited from pallas_ipm_batch (verified there by
probes): slice-only indexing on laned values, no in-kernel scatters,
manual DMAs only on _r8-aligned second-minor dims — every streamed array
pads its second-minor dim to a multiple of 8 and slices after the copy.

Scope: f32, eq-constrained problems with NO inequalities (`data.con` is
None or ng == 0) — the legged soft-cone mode. Per-problem C/D/e/mask (they
depend on per-scenario contact flags). Gains K/k are REAL outputs (they
are VMEM-resident anyway and the MRT policy path consumes them); the
value function P/p is NaN by design (only a rolling P is kept — consuming
it should be loud, not silently zero).

Reference role: HPIPM's ric_alg=0 square-root Riccati recursion over
BLASFEO panel kernels (SURVEY.md L0, HpipmInterfaceSettings.h:56), here
shared by 128 robots per VMEM tile.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cheeta_mpc_tpu.core.types import OcpQpData, OcpQpSolution, RiccatiGains
from cheeta_mpc_tpu.ops.pallas_ipm_batch import (LANE_B, _r8, _tile, _untile,
                                                 bmm_nn, bmm_tn, mv_nn, mv_tn,
                                                 sym2, tr2)


def gj_inverse_plain_b(M):
    """Lane-batched PLAIN Gauss-Jordan SPD inverse: (n, n, B).

    Same choice as the batch-1 eq kernel (`ops/pallas_riccati._gj_inverse`):
    no Jacobi pre-equilibration. On the eq-LQR recursion the equilibrated
    variant is the LESS robust of the two — near-semidefinite Q can push a
    tiny G/Lam diagonal negative in f32, where rsqrt(max(d, eps)) produces
    a catastrophic 1e15 scale (measured: 47/128 NaN elements on the random
    eq-batch oracle) while the plain pivot division recovers. The IPM fleet
    kernel keeps the equilibrated variant because its barrier-conditioned G
    genuinely needs it (and is diagonally dominated by construction)."""
    n, _, B = M.shape
    dt = M.dtype
    eye3 = jnp.broadcast_to(jnp.reshape(jnp.eye(n, dtype=dt), (n, n, 1)),
                            (n, n, B))
    Ag = jnp.concatenate([M, eye3], axis=1)
    one_hot = jnp.eye(n, dtype=dt)
    for j in range(n):
        pivot = Ag[j:j + 1, j:j + 1, :]  # (1, 1, B)
        row_j = Ag[j:j + 1] / pivot  # (1, 2n, B)
        col_j = Ag[:, j:j + 1, :]  # (n, 1, B)
        # Two-step add-back, NOT the one-hot-shifted column: with unscaled
        # pivots the shifted form's (pivot - 1) absorbs the 1 for large
        # pivots and row j degrades (ops/pallas_riccati._gj_inverse).
        Ag = Ag - col_j * row_j
        Ag = Ag + jnp.reshape(one_hot[:, j:j + 1], (n, 1, 1)) * row_j
    return Ag[:, n:, :]

# Streamed per-stage arrays, in DMA-slot order.
_N_STREAMS = 4  # M=[A|B], QSR, CD, vec


def _eq_fleet_kernel(M_hbm, QSR_hbm, CD_hbm, vec_hbm,
                     QN_ref, qN_ref, dx0_ref,
                     # outputs
                     dx_o, du_o, K_hbm, kv_hbm,
                     # scratch
                     K_ref, kv_ref, P_ref, p_ref,
                     Mb, QSRb, CDb, vecb, sem, osem,
                     *, N, nx, nu, nc, reg, eps):
    """One 128-problem tile. Backward streams stages N-1..0 (factorize +
    vector pass fused), forward re-streams the dynamics 0..N-1."""
    f32 = jnp.float32
    B = LANE_B
    t = pl.program_id(0)
    nx_pad = _r8(nx) - nx
    nu_pad = _r8(nu) - nu

    def start(k, slot):
        for i, (src, dst) in enumerate(((M_hbm, Mb), (QSR_hbm, QSRb),
                                        (CD_hbm, CDb), (vec_hbm, vecb))):
            pltpu.make_async_copy(src.at[t, k], dst.at[slot],
                                  sem.at[slot, i]).start()

    def wait(k, slot):
        for i, (src, dst) in enumerate(((M_hbm, Mb), (QSR_hbm, QSRb),
                                        (CD_hbm, CDb), (vec_hbm, vecb))):
            pltpu.make_async_copy(src.at[t, k], dst.at[slot],
                                  sem.at[slot, i]).wait()

    def start_fwd(k, slot):
        # Forward pass only needs the dynamics [A|B] and the vec row (b).
        pltpu.make_async_copy(M_hbm.at[t, k], Mb.at[slot],
                              sem.at[slot, 0]).start()
        pltpu.make_async_copy(vec_hbm.at[t, k], vecb.at[slot],
                              sem.at[slot, 3]).start()

    def wait_fwd(k, slot):
        pltpu.make_async_copy(M_hbm.at[t, k], Mb.at[slot],
                              sem.at[slot, 0]).wait()
        pltpu.make_async_copy(vec_hbm.at[t, k], vecb.at[slot],
                              sem.at[slot, 3]).wait()

    eye_u = jnp.reshape(jnp.eye(nu, dtype=f32), (nu, nu, 1))
    eye_c = jnp.reshape(jnp.eye(nc, dtype=f32), (nc, nc, 1))

    # ---- terminal boundary (symmetrized like solve_eq_lqr) -----------------
    P_ref[...] = sym2(QN_ref[0])
    p_ref[...] = qN_ref[0]

    # ---- backward: factorize + vector pass, one streamed loop --------------
    start(N - 1, 0)

    def backward(i, carry):
        k = N - 1 - i
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < N)
        def _prefetch():
            start(k - 1, 1 - slot)

        wait(k, slot)
        Mk = Mb[slot]  # (nx, nxu_p, B)
        A = Mk[:, :nx, :]
        Bm = Mk[:, nx:nx + nu, :]
        QSR = QSRb[slot]
        Qk = QSR[:nx, :nx, :]
        Sk = QSR[nx:nx + nu, :nx, :]
        Rk = QSR[nx + nu:nx + 2 * nu, :nu, :]
        CD = CDb[slot]
        Ck = CD[:, :nx, :]  # (nc, nx, B)
        Dk = CD[:, nx:nx + nu, :]  # (nc, nu, B)
        v = vecb[slot]
        bv = v[:nx]
        qv = v[nx:2 * nx]
        rv = v[2 * nx:2 * nx + nu]
        ev = v[2 * nx + nu:2 * nx + nu + nc]
        mk = v[2 * nx + nu + nc:2 * nx + nu + 2 * nc]

        P_next = P_ref[...]
        p_next = p_ref[...]
        PM = bmm_nn(P_next, Mk)  # (nx, nxu_p, B); pad cols zero
        PA = PM[:, :nx, :]
        PB = PM[:, nx:nx + nu, :]
        G = Rk + bmm_tn(Bm, PB) + reg * eye_u
        H = Sk + bmm_tn(Bm, PA)  # (nu, nx, B)
        Ginv = gj_inverse_plain_b(sym2(G))
        Y = bmm_nn(Ginv, tr2(Dk))  # (nu, nc, B)
        Lam = (bmm_nn(Dk, Y)
               + eye_c * jnp.reshape(eps * (1.0 - mk), (nc, 1, B)))
        Li = gj_inverse_plain_b(sym2(Lam))
        YLi = bmm_nn(Y, Li)  # (nu, nc, B)
        W = Ginv - bmm_nn(YLi, tr2(Y))
        Kk = -(bmm_nn(W, H) + bmm_nn(YLi, Ck))  # (nu, nx, B)
        CYH = Ck - bmm_nn(tr2(Y), H)  # (nc, nx, B)
        Pk = (Qk + bmm_tn(A, PA) + bmm_tn(H, Kk)
              + bmm_tn(Ck, bmm_nn(Li, CYH)))

        # Vector pass (h = -(mask * e), matching solve_eq_lqr).
        h = -(mk * ev)  # (nc, B)
        mv = p_next + mv_nn(P_next, bv)  # (nx, B); P_next exactly symmetric
        g = rv + mv_tn(Bm, mv)  # (nu, B)
        kvec = -(mv_nn(W, g) - mv_nn(YLi, h))  # (nu, B)
        nu0 = -(mv_nn(Li, h) + mv_tn(YLi, g))  # (nc, B)
        pk = qv + mv_tn(A, mv) + mv_tn(H, kvec) + mv_tn(Ck, nu0)

        P_ref[...] = sym2(Pk)
        p_ref[...] = pk
        # The K/k scratch second-minor dims are _r8-padded: the final DMA
        # out of the resident factors crashes the TPU worker on unaligned
        # second-minor dims (same constraint as the streamed inputs,
        # isolated by probe — K's nx and k's nu both need padding).
        if nx_pad:
            Kk = jnp.concatenate(
                [Kk, jnp.zeros((nu, nx_pad, B), f32)], axis=1)
        if nu_pad:
            kvec = jnp.concatenate(
                [kvec, jnp.zeros((nu_pad, B), f32)], axis=0)
        K_ref[k] = Kk
        kv_ref[k] = kvec
        return carry

    jax.lax.fori_loop(0, N, backward, 0)

    # Ship the resident factors out while the forward pass runs.
    pltpu.make_async_copy(K_ref, K_hbm.at[t], osem.at[0]).start()
    pltpu.make_async_copy(kv_ref, kv_hbm.at[t], osem.at[1]).start()

    # ---- forward rollout (dynamics re-streamed 0..N-1) ---------------------
    start_fwd(0, 0)
    dx_o[0, 0] = dx0_ref[0]

    def forward(k, dxk):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < N)
        def _prefetch():
            start_fwd(k + 1, 1 - slot)

        wait_fwd(k, slot)
        Mk = Mb[slot]
        A = Mk[:, :nx, :]
        Bm = Mk[:, nx:nx + nu, :]
        bv = vecb[slot][:nx]
        du = mv_nn(K_ref[k][:, :nx, :], dxk) + kv_ref[k][:nu, :]
        du_o[0, k] = du
        dxn = mv_nn(A, dxk) + mv_nn(Bm, du) + bv
        dx_o[0, k + 1] = dxn
        return dxn

    jax.lax.fori_loop(0, N, forward, dx0_ref[0])

    pltpu.make_async_copy(K_ref, K_hbm.at[t], osem.at[0]).wait()
    pltpu.make_async_copy(kv_ref, kv_hbm.at[t], osem.at[1]).wait()


@functools.partial(jax.jit, static_argnames=("reg", "eps", "interpret"))
def solve_eq_lqr_fleet(data: OcpQpData, reg: float = 1e-9, eps: float = 1.0,
                       interpret: bool = False) -> OcpQpSolution:
    """Batched eq-LQR solve on BATCH-LEADING data (every leaf of ``data``
    carries a leading batch axis; batch must be a multiple of ``LANE_B`` —
    pad upstream). See the module docstring for scope; P/p in the returned
    gains are NaN by design, K/k are real."""
    dyn, cost, eq = data.dyn, data.cost, data.eq
    batch = data.dx0.shape[0]
    assert batch % LANE_B == 0, f"batch {batch} not a multiple of {LANE_B}"
    T = batch // LANE_B
    N = dyn.A.shape[1]
    nx = dyn.A.shape[-1]
    nu = dyn.B.shape[-1]
    nc = eq.C.shape[-2]
    f32 = jnp.float32
    nxu_p = _r8(nx + nu)
    nn_p = _r8(max(nx, nu))
    nx_p = _r8(nx)
    nu_p = _r8(nu)
    nv = 2 * nx + nu + 2 * nc
    nv_p = _r8(nv)

    def pad_last(x, to):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])])

    # Streamed stage arrays: (T, N, rows, cols_p, B) / (T, N, nv_p, B).
    M = _tile(pad_last(jnp.concatenate([dyn.A, dyn.B], axis=-1),
                       nxu_p).astype(f32), T)
    QSR = _tile(jnp.concatenate(
        [pad_last(cost.Q[:, :-1], nn_p), pad_last(cost.S, nn_p),
         pad_last(cost.R, nn_p)], axis=-2).astype(f32), T)
    CD = _tile(pad_last(jnp.concatenate([eq.C, eq.D], axis=-1),
                        nxu_p).astype(f32), T)
    vec = _tile(pad_last(jnp.concatenate(
        [dyn.b, cost.q[:, :-1], cost.r, eq.e, eq.mask], axis=-1),
        nv_p).astype(f32), T)
    QN = _tile(cost.Q[:, -1].astype(f32), T)
    qN = _tile(cost.q[:, -1].astype(f32), T)
    dx0 = _tile(data.dx0.astype(f32), T)

    kern = functools.partial(_eq_fleet_kernel, N=N, nx=nx, nu=nu, nc=nc,
                             reg=float(reg), eps=float(eps))
    B = LANE_B

    def blk(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda t: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec] * _N_STREAMS + [
        blk((nx, nx, B)), blk((nx, B)), blk((nx, B))]
    out_specs = (
        blk((N + 1, nx, B)), blk((N, nu, B)),  # dx, du (pipelined blocks)
        any_spec, any_spec,  # K, k (manual DMA from resident scratch)
    )
    out_shape = (
        jax.ShapeDtypeStruct((T, N + 1, nx, B), f32),  # dx
        jax.ShapeDtypeStruct((T, N, nu, B), f32),  # du
        jax.ShapeDtypeStruct((T, N, nu, nx_p, B), f32),  # K (padded)
        jax.ShapeDtypeStruct((T, N, nu_p, B), f32),  # k (padded)
    )
    scratch = [
        pltpu.VMEM((N, nu, nx_p, B), f32),  # K (resident; _r8 2nd-minor)
        pltpu.VMEM((N, nu_p, B), f32),  # k (_r8 2nd-minor)
        pltpu.VMEM((nx, nx, B), f32),  # P roll
        pltpu.VMEM((nx, B), f32),  # p roll
        pltpu.VMEM((2, nx, nxu_p, B), f32),  # M double buffer
        pltpu.VMEM((2, nx + 2 * nu, nn_p, B), f32),  # QSR
        pltpu.VMEM((2, nc, nxu_p, B), f32),  # CD
        pltpu.VMEM((2, nv_p, B), f32),  # vec
        pltpu.SemaphoreType.DMA((2, _N_STREAMS)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    dx_t, du_t, K_t, kv_t = pl.pallas_call(
        kern,
        grid=(T,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        # ~25 MB peak (K factors + double-buffered stage slots) — above the
        # compiler's conservative 16 MB scoped default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(M, QSR, CD, vec, QN, qN, dx0)

    dx = _untile(dx_t)
    du = _untile(du_t)
    K = _untile(K_t)[:, :, :, :nx]
    kv = _untile(kv_t)[:, :, :nu]
    nanP = jnp.full((batch, N + 1, nx, nx), np.nan, f32)
    nanp = jnp.full((batch, N + 1, nx), np.nan, f32)
    ng = 0 if data.con is None else data.con.C.shape[-2]
    zshape = (batch, N + 1, ng)
    zerov = jnp.zeros((batch,), f32)
    return OcpQpSolution(
        dx=dx, du=du,
        gains=RiccatiGains(K=K, k=kv, P=nanP, p=nanp),
        lam_l=jnp.zeros(zshape, f32), lam_u=jnp.zeros(zshape, f32),
        s_l=jnp.ones(zshape, f32), s_u=jnp.ones(zshape, f32),
        iterations=jnp.zeros((batch,), jnp.int32), mu=zerov,
        stat_res=zerov, ineq_res=zerov,
        eq_res=jnp.max(jnp.abs(
            jnp.einsum('bkij,bkj->bki', data.dyn.A, dx[:, :-1])
            + jnp.einsum('bkij,bkj->bki', data.dyn.B, du)
            + data.dyn.b - dx[:, 1:]), axis=(1, 2)))


@functools.lru_cache(maxsize=None)
def make_fleet_eq_solver(reg: float = 1e-9, eps: float = 1.0,
                         interpret: bool = False):
    """An eq-LQR solver that is the fused batch-1 kernel when called
    directly and the lane-batched fleet kernel under ``jax.vmap`` — the
    eq-only analogue of ``make_fleet_qp_solver``.

    The vmap rule falls back to a plain ``jax.vmap`` of the scan solver
    (with a trace-time warning, never silently) when the workload is
    outside the fleet kernel's scope: f64, no equality rows, or a batch
    not divisible by LANE_B.
    """
    from jax.custom_batching import custom_vmap

    from cheeta_mpc_tpu.ops.pallas_riccati import pallas_solve_eq_lqr
    from cheeta_mpc_tpu.ops.riccati import solve_eq_lqr

    @custom_vmap
    def eq_solve(data):
        return pallas_solve_eq_lqr(data, reg=reg, eps=eps,
                                   interpret=interpret)

    @eq_solve.def_vmap
    def _rule(axis_size, in_batched, data):
        db = in_batched[0] if isinstance(in_batched, (list, tuple)) \
            else in_batched
        in_scope = (data.eq is not None and data.eq.C.shape[-2] > 0
                    and data.dx0.dtype != jnp.float64
                    and axis_size % LANE_B == 0)

        def bcast(x, b):
            if x is None:
                return None
            return x if b else jnp.broadcast_to(
                jnp.asarray(x)[None], (axis_size,) + jnp.shape(x))

        full = jax.tree.map(lambda x, b: bcast(x, b), data, db,
                            is_leaf=lambda x: x is None)
        if in_scope:
            out = solve_eq_lqr_fleet(full, reg=reg, eps=eps,
                                     interpret=interpret)
        else:
            warnings.warn(
                "fleet eq-LQR kernel out of scope (f64, no eq rows, or "
                f"batch {axis_size} % {LANE_B} != 0); falling back to the "
                "vmapped scan solver", stacklevel=2)
            out = jax.vmap(lambda d: solve_eq_lqr(d, reg=reg))(full)
        out_batched = jax.tree.map(lambda _: True, out)
        return out, out_batched

    return eq_solve
