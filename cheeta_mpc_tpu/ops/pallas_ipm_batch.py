"""Batched (fleet-scale) Riccati-IPM solver: one Pallas kernel per 128-problem
VMEM tile, batch on the vector lanes.

Why this exists (PERF.md roofline, round 4): the vmapped XLA scan solver is
bound by *tile padding* on its stage-serial batched small ops — with batch
leading, every (1024, 33, 57)-ish matmul operand pads its LAST TWO dims to
(8, 128) tiles, inflating HBM traffic ~4.8x and pinning throughput at
~4.3k solves/s/chip (0.33% MFU) against the padded-traffic HBM bound. This
kernel is PERF.md lever 3 (VMEM-resident problem tiles) combined with lever
2 (batch-minor layout): the scenario batch lives on the 128-wide lane axis,
matrices sit on the sublane axis (33 pads to 40, a 1.2x cost instead of
3.9x), and the ENTIRE 128-problem tile — QP data, iterate, slacks, duals,
Riccati factors — stays VMEM-resident across ALL iterations (one bulk DMA
per data array per tile; HBM sees the data once). Compute becomes VPU
multiply-accumulate (batched small matmuls with batch on lanes cannot use
the MXU), whose f32 peak is far above the padded-HBM bound the scan path
sits on. Measured on v5e at N=10, batch 1024, 2 SQP x 10 IPM:
8.4k solves/s/chip device-side vs 4.3k for the scan, with 1e-4 N GRF
agreement against the precision-pinned scan across the whole batch.

The algorithm is the exact fixed-iteration Mehrotra predictor-corrector of
:func:`cheeta_mpc_tpu.ops.ocpqp.solve_ocp_qp` (same init, barrier algebra,
fraction-to-boundary, convergence freeze, stationarity step guard) — the
third executor of the same math after the scan path and the batch-1 fused
kernel (ops/pallas_ipm_riccati.py); cross-executor oracles in
tests/test_pallas_ipm_batch.py and bench.py keep all three in agreement.

Design notes:
- P is never stored per stage: the vector passes only need P_{k+1} @ rd_k,
  which the factorization sweep folds into a per-stage vector ``Prd`` while
  P rolls through a single (nx, nx, B) buffer.
- The lambda-independent gradient parts gq = q + Q dx + S' du and
  gr = r + R du + S dx are computed once per iteration in the factorization
  sweep, so the Newton and guard sweeps touch no cost data.
- VMEM budget: the chip's usable VMEM is ~100+ MB (probed empirically with
  value-verified scratch kernels); the guide-quoted ~16 MB is only the
  compiler's conservative scoped default, raised via
  ``CompilerParams(vmem_limit_bytes=...)``. The blocked-input pipeline is
  bypassed for the five big data arrays (it would double-buffer ~26 MB);
  they arrive by one explicit DMA per tile instead. A bf16 storage variant
  of the factors was measured and rejected: at barrier conditioning ~1/mu
  the rounded G^{-1} produces blow-up directions (NaN by iteration ~8).
- Mosaic constraints baked into the helpers: no integer+newaxis subscripts
  on laned values (lowers to unsupported >2D gathers), no ``.at[i].set``
  (scatter), manual DMAs only on tile-aligned second-minor dims (unaligned
  slices CRASH the TPU worker — hence the _r8 padding of every streamed
  array).
- When validating this kernel on hardware, pin the reference's matmul
  precision (``jax.default_matmul_precision('highest')``) AND generate
  test data deterministically on host: the default-precision scan (one
  bf16 MXU pass) and bf16-contaminated data differ from the kernel's
  all-f32 VPU math by ~2^-8 relative — which reads exactly like a kernel
  bug and is not one.

Scope (the centroidal fleet workload): inequality-constrained f32 problems
with batch-shared constraint matrices C/D (the friction pyramid + footstep
boxes are config constants — only the bounds vary per scenario). Stage
equalities, f64, or per-problem C/D take the vmapped scan solver instead
(see ``make_fleet_qp_solver``). Riccati gains / value function are NOT
produced (the fleet path consumes trajectories only); returned gains are
NaN so accidental consumption is loud rather than silently zero. Batch-1
and policy paths keep the fused batch-1 kernel, which produces real gains.

Reference role: BLASFEO keeping HPIPM's working set in registers across the
recursion (SURVEY.md L0; HpipmInterfaceSettings.h:56) — here the "registers"
are a 128-lane VMEM tile and the recursion is shared by 128 robots at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cheeta_mpc_tpu.core.types import OcpQpData, OcpQpSolution, RiccatiGains

LANE_B = 128  # problems per tile = TPU vector lane count


def _r8(n: int) -> int:
    """Round up to a multiple of 8 (the f32 sublane tile). Manual DMAs
    of slices whose second-minor dim is NOT tile-aligned crash the TPU
    worker (verified on v5e with a minimal probe); every manually
    streamed array is therefore padded to _r8 on that dim and sliced
    back after the copy."""
    return -(-n // 8) * 8
_BIG = 3.0e38  # inf stand-in for masked minima


# ---- lane-batched small linear algebra (batch = trailing axis) -------------
# All inner loops are Python-unrolled over STATIC matrix dims (<= nx+nu), so
# every slice index is static; only stage/tile indices are dynamic (on refs).

def bmm_nn(X, Y):
    """(p, q, B) @ (q, r, B) -> (p, r, B): sum of outer products over q.

    Slice-only indexing (X[:, k:k+1, :], Y[k:k+1]): integer-plus-newaxis
    subscripts on laned 3D values lower to an (unsupported) >2D gather in
    Mosaic; explicit length-1 slices lower to plain strided slices."""
    q = X.shape[1]
    acc = X[:, 0:1, :] * Y[0:1]
    for k in range(1, q):
        acc = acc + X[:, k:k + 1, :] * Y[k:k + 1]
    return acc


def bmm_tn(X, Y):
    """X' @ Y contracting the LEADING axis: (q, p, B), (q, r, B) ->
    (p, r, B). One relayout (swapaxes) then the slice-form product."""
    return bmm_nn(jnp.swapaxes(X, 0, 1), Y)


def mv_nn(X, v):
    """(p, q, B) x (q, B) -> (p, B)."""
    return jnp.sum(X * v[None, :, :], axis=1)


def mv_tn(X, v):
    """(q, p, B)' x (q, B) -> (p, B)."""
    return jnp.sum(X * v[:, None, :], axis=0)


def outer_acc(Cs, w):
    """C' diag(w) C for batch-shared C (g, n) and lane-batched w (g, B)
    -> (n, n, B)."""
    g = Cs.shape[0]
    acc = (Cs[0][:, None] * Cs[0][None, :])[:, :, None] * w[0][None, None, :]
    for r in range(1, g):
        acc = acc + ((Cs[r][:, None] * Cs[r][None, :])[:, :, None]
                     * w[r][None, None, :])
    return acc


def outer_acc2(Ca, Cb, w):
    """Ca' diag(w) Cb for shared Ca (g, m), Cb (g, n), lane w (g, B)
    -> (m, n, B)."""
    g = Ca.shape[0]
    acc = (Ca[0][:, None] * Cb[0][None, :])[:, :, None] * w[0][None, None, :]
    for r in range(1, g):
        acc = acc + ((Ca[r][:, None] * Cb[r][None, :])[:, :, None]
                     * w[r][None, None, :])
    return acc


def shared_mv(Cs, x):
    """(g, n) shared x (n, B) -> (g, B)."""
    return jnp.sum(Cs[:, :, None] * x[None, :, :], axis=1)


def shared_mv_t(Cs, lam):
    """(g, n)' shared x (g, B) -> (n, B)."""
    return jnp.sum(Cs[:, :, None] * lam[:, None, :], axis=0)


def tr2(X):
    """Transpose the first two axes of (p, q, B) via static sublane picks
    (Mosaic-friendly alternative to a tiled-axis swapaxes)."""
    return jnp.stack([X[:, i, :] for i in range(X.shape[1])], axis=0)


def sym2(X):
    """0.5 (X + X') on the leading two axes of (n, n, B)."""
    return 0.5 * (X + tr2(X))


def gj_inverse_b(M):
    """Lane-batched equilibrated Gauss-Jordan SPD inverse: (n, n, B).

    Same numerics as ops/pallas_riccati.spd_inverse_kernel (Jacobi
    pre-equilibration, no Newton refinement — see that docstring), with the
    pivot loop Python-unrolled (static indices everywhere)."""
    n, _, B = M.shape
    dt = M.dtype
    d = jnp.stack([M[i, i, :] for i in range(n)])  # (n, B) diagonal
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    # Explicit reshapes, never newaxis subscripts: slice+None combos on
    # laned values lower to unsupported gathers in Mosaic.
    s_col = jnp.reshape(s, (n, 1, B))
    s_row = jnp.reshape(s, (1, n, B))
    Ms = s_col * M * s_row
    # jnp.eye (iota-based, traced) rather than a numpy literal: non-scalar
    # numpy constants become jaxpr consts, which pallas_call rejects.
    eye3 = jnp.broadcast_to(jnp.reshape(jnp.eye(n, dtype=dt), (n, n, 1)),
                            (n, n, B))
    Ag = jnp.concatenate([Ms, eye3], axis=1)
    one_hot = jnp.eye(n, dtype=dt)
    for j in range(n):
        pivot = Ag[j:j + 1, j:j + 1, :]  # (1, 1, B)
        row_j = Ag[j:j + 1] / pivot  # (1, 2n, B)
        # One-hot-shifted pivot column: the single elimination FMA also
        # lands row j on the normalized pivot row (no scatter, no separate
        # add-back op; ops/pallas_riccati._gj_inverse has the rounding
        # note — rows i != j are bitwise unchanged).
        colm = (Ag[:, j:j + 1, :]
                - jnp.reshape(one_hot[:, j:j + 1], (n, 1, 1)))  # (n, 1, B)
        Ag = Ag - colm * row_j
    X = Ag[:, n:, :]
    return s_col * X * s_row


def _fleet_kernel(M_hbm, Q_hbm, S_hbm, R_hbm, vec_hbm,
                  qN_ref, lg_ref, ug_ref, m_ref, dx0_ref, C_ref, D_ref,
                  # outputs
                  dx_o, du_o, sl_o, su_o, ll_o, lu_o, diag_o,
                  # scratch
                  dx_ref, du_ref, sl_ref, su_ref, ll_ref, lu_ref,
                  rl_ref, ru_ref, ln_ref, rc1_ref, rc2_ref,
                  gq_ref, gr_ref, rd_ref, Prd_ref, kv_ref,
                  ddx_ref, ddu_ref, dsl_ref, dsu_ref, dll_ref, dlu_ref,
                  K_ref, Gi_ref, Pr_ref,
                  M_ref, Q_ref, S_ref, R_ref, vec_ref, sem,
                  *, N, nx, nu, ng, iters, tau, mu0, s0_min, reg, w_max,
                  mu_tol):
    """One 128-problem tile, everything VMEM-resident.

    The measured v5e has ~100+ MB of usable VMEM (probed empirically; the
    often-quoted 16 MB is only the compiler's conservative scoped default),
    so the ENTIRE tile working set — QP data, iterate, slacks/duals, and
    the per-stage Riccati factors — lives in VMEM for all IPM iterations.
    HBM traffic is one stream of the problem data in and the solution out:
    the design point PERF.md's round-4 roofline called lever 3. An earlier
    revision streamed stage data and spilled K/G^{-1} to HBM to fit a 16 MB
    budget; with the real budget that machinery (and its per-stage DMA
    latency) is deleted.
    """
    f32 = jnp.float32
    B = LANE_B
    t = pl.program_id(0)

    # One bulk DMA per data array per tile (single-buffered: blocked-input
    # pipelining would double-buffer ~26 MB of tile data and blow the
    # VMEM budget; a one-time ~30 us wait at tile start is cheaper).
    for i, (src, dst) in enumerate(((M_hbm, M_ref), (Q_hbm, Q_ref),
                                    (S_hbm, S_ref), (R_hbm, R_ref),
                                    (vec_hbm, vec_ref))):
        pltpu.make_async_copy(src.at[t], dst, sem.at[i]).start()
    for i, (src, dst) in enumerate(((M_hbm, M_ref), (Q_hbm, Q_ref),
                                    (S_hbm, S_ref), (R_hbm, R_ref),
                                    (vec_hbm, vec_ref))):
        pltpu.make_async_copy(src.at[t], dst, sem.at[i]).wait()

    def stage_M(k):
        Mk = M_ref[k]
        return Mk[:, :nx, :], Mk[:, nx:nx + nu, :]

    def stage_Q(k):
        return Q_ref[k][:, :nx, :]

    def stage_S(k):
        return S_ref[k][:, :nx, :]

    def stage_R(k):
        return R_ref[k][:, :nu, :]

    def stage_vec(k):
        v = vec_ref[k]
        return v[:nx], v[nx:2 * nx], v[2 * nx:2 * nx + nu]

    # ---- initialization (ocpqp.solve_ocp_qp init with zero iterate) --------
    m = m_ref[0]
    lg = lg_ref[0]
    ug = ug_ref[0]
    sl0 = jnp.where(m > 0, jnp.maximum(-lg, s0_min), 1.0)
    su0 = jnp.where(m > 0, jnp.maximum(ug, s0_min), 1.0)
    sl_ref[...] = sl0
    su_ref[...] = su0
    ll_ref[...] = jnp.where(m > 0, mu0 / sl0, 0.0)
    lu_ref[...] = jnp.where(m > 0, mu0 / su0, 0.0)
    dx_ref[...] = jnp.zeros((N + 1, nx, B), f32)
    du_ref[...] = jnp.zeros((N, nu, B), f32)
    ddx_ref[...] = jnp.zeros((N + 1, nx, B), f32)
    ddu_ref[...] = jnp.zeros((N, nu, B), f32)
    dll_ref[...] = jnp.zeros((N + 1, ng, B), f32)
    dlu_ref[...] = jnp.zeros((N + 1, ng, B), f32)

    # ---- stationarity sweep (ocpqp._stationarity_norm, nc = 0) -------------
    def stat_at(a):
        m = m_ref[0]
        ln_ref[...] = m * ((lu_ref[...] + a * dlu_ref[...])
                           - (ll_ref[...] + a * dll_ref[...]))
        xN = dx_ref[N] + a * ddx_ref[N]
        mu0_vec = (qN_ref[0] + mv_nn(stage_Q(N), xN)
                   + shared_mv_t(C_ref[N], ln_ref[N]))

        def body(i, carry):
            k = N - 1 - i
            mu_next, smax = carry
            A, Bm = stage_M(k)
            _, qv, rv = stage_vec(k)
            xk = dx_ref[k] + a * ddx_ref[k]
            uk = du_ref[k] + a * ddu_ref[k]
            lnk = ln_ref[k]
            Sv = stage_S(k)
            qbar = (qv + mv_nn(stage_Q(k), xk) + mv_tn(Sv, uk)
                    + shared_mv_t(C_ref[k], lnk))
            gr = (rv + mv_nn(stage_R(k), uk) + mv_nn(Sv, xk)
                  + shared_mv_t(D_ref[k], lnk))
            t_u = gr + mv_tn(Bm, mu_next)
            smax = jnp.maximum(smax, jnp.max(jnp.abs(t_u), axis=0))
            return (qbar + mv_tn(A, mu_next), smax)

        _, smax = jax.lax.fori_loop(0, N, body,
                                    (mu0_vec, jnp.zeros((B,), f32)))
        return smax  # (B,)

    stat0 = stat_at(jnp.zeros((B,), f32))

    # ---- combined residual + gradient + factorization sweep ----------------
    def fact_sweep():
        """Backward over stages: residuals (rl/ru rows, rd), pure gradients
        gq/gr, barrier-augmented Riccati factorization with
        Prd = P_{k+1} rd_k folded in (P rolls through one buffer)."""
        wN = m_ref[0, N] * jnp.minimum(ll_ref[N] / sl_ref[N]
                                       + lu_ref[N] / su_ref[N], w_max)
        QN = stage_Q(N)
        gN = shared_mv(C_ref[N], dx_ref[N])
        rl_ref[N] = gN - sl_ref[N] - lg_ref[0, N]
        ru_ref[N] = gN + su_ref[N] - ug_ref[0, N]
        gq_ref[N] = qN_ref[0] + mv_nn(QN, dx_ref[N])
        Pr_ref[...] = sym2(QN) + outer_acc(C_ref[N], wN)

        def body(i, c):
            k = N - 1 - i
            A, Bm = stage_M(k)
            Mk = M_ref[k]
            bv, qv, rv = stage_vec(k)
            xk = dx_ref[k]
            uk = du_ref[k]
            gk = shared_mv(C_ref[k], xk) + shared_mv(D_ref[k], uk)
            rl_ref[k] = gk - sl_ref[k] - lg_ref[0, k]
            ru_ref[k] = gk + su_ref[k] - ug_ref[0, k]
            rdk = mv_nn(A, xk) + mv_nn(Bm, uk) + bv - dx_ref[k + 1]
            rd_ref[k] = rdk
            Qv = stage_Q(k)
            Sv = stage_S(k)
            Rv = stage_R(k)
            gq_ref[k] = qv + mv_nn(Qv, xk) + mv_tn(Sv, uk)
            gr_ref[k] = rv + mv_nn(Rv, uk) + mv_nn(Sv, xk)
            wk = m_ref[0, k] * jnp.minimum(
                ll_ref[k] / sl_ref[k] + lu_ref[k] / su_ref[k], w_max)
            Qb = Qv + outer_acc(C_ref[k], wk)
            Rb = Rv + outer_acc(D_ref[k], wk)
            Sb = Sv + outer_acc2(D_ref[k], C_ref[k], wk)
            P_next = Pr_ref[...]
            Prd_ref[k] = mv_nn(P_next, rdk)
            PM = bmm_nn(P_next, Mk)  # (nx, nxu_p, B); pad cols are zero
            PA = PM[:, :nx, :]
            PB = PM[:, nx:nx + nu, :]
            G = (Rb + bmm_tn(Bm, PB)
                 + reg * jnp.eye(nu, dtype=f32)[:, :, None])
            Hk = Sb + bmm_tn(Bm, PA)
            Gi = gj_inverse_b(sym2(G))
            Kk = -bmm_nn(Gi, Hk)  # (nu, nx, B)
            Pk = Qb + bmm_tn(A, PA) + bmm_tn(Hk, Kk)
            Pr_ref[...] = sym2(Pk)
            K_ref[k] = Kk
            Gi_ref[k] = Gi
            return c

        jax.lax.fori_loop(0, N, body, 0)

    # ---- Newton vector + forward passes against stored factors -------------
    def newton():
        """RHS in rc1/rc2. Writes ddx/ddu/dsl/dsu/dll/dlu (and kv)."""
        m = m_ref[0]
        sl = sl_ref[...]
        su = su_ref[...]
        ll = ll_ref[...]
        lu = lu_ref[...]
        rl = rl_ref[...]
        ru = ru_ref[...]
        rcl = rc1_ref[...]
        rcu = rc2_ref[...]
        beta = m * ((ll / sl) * rl + (lu / su) * ru + rcl / sl - rcu / su)
        ln_ref[...] = m * (lu - ll + beta)

        qbarN = gq_ref[N] + shared_mv_t(C_ref[N], ln_ref[N])

        def bwd(i, p_next):
            k = N - 1 - i
            A, Bm = stage_M(k)
            qbar = gq_ref[k] + shared_mv_t(C_ref[k], ln_ref[k])
            rbar = gr_ref[k] + shared_mv_t(D_ref[k], ln_ref[k])
            mv = p_next + Prd_ref[k]
            rhs = rbar + mv_tn(Bm, mv)
            kvk = -mv_nn(Gi_ref[k], rhs)
            pk = qbar + mv_tn(A, mv) + mv_tn(K_ref[k], rhs)
            kv_ref[k] = kvk
            return pk

        jax.lax.fori_loop(0, N, bwd, qbarN)

        ddx_ref[0] = dx0_ref[0] - dx_ref[0]

        def fwd(k, c):
            A, Bm = stage_M(k)
            xk = ddx_ref[k]
            uk = mv_nn(K_ref[k], xk) + kv_ref[k]
            ddu_ref[k] = uk
            ddx_ref[k + 1] = mv_nn(A, xk) + mv_nn(Bm, uk) + rd_ref[k]
            dgk = shared_mv(C_ref[k], xk) + shared_mv(D_ref[k], uk)
            mk = m_ref[0, k]
            dsl_ref[k] = mk * (dgk + rl_ref[k])
            dsu_ref[k] = mk * (-dgk - ru_ref[k])
            return c

        jax.lax.fori_loop(0, N, fwd, 0)
        dgN = shared_mv(C_ref[N], ddx_ref[N])
        dsl_ref[N] = m_ref[0, N] * (dgN + rl_ref[N])
        dsu_ref[N] = m_ref[0, N] * (-dgN - ru_ref[N])
        dll_ref[...] = (-m * (rc1_ref[...] + ll_ref[...] * dsl_ref[...])
                        / sl_ref[...])
        dlu_ref[...] = (-m * (rc2_ref[...] + lu_ref[...] * dsu_ref[...])
                        / su_ref[...])

    def max_step(v, dv):
        m = m_ref[0]
        ratio = jnp.where((dv < 0) & (m > 0),
                          -tau * v / jnp.minimum(dv, -1e-30), _BIG)
        return jnp.minimum(1.0, jnp.min(ratio, axis=(0, 1)))  # (B,)

    # ---- the Mehrotra loop -------------------------------------------------
    def ipm_iter(it, carry):
        stat_old, _ = carry
        fact_sweep()
        m = m_ref[0]
        n_active = jnp.maximum(jnp.sum(m, axis=(0, 1)), 1.0)  # (B,)
        sl = sl_ref[...]
        su = su_ref[...]
        ll = ll_ref[...]
        lu = lu_ref[...]
        mu = jnp.sum(m * (sl * ll + su * lu), axis=(0, 1)) / (2.0 * n_active)

        # Predictor (affine direction, sigma = 0).
        rc1_ref[...] = m * (sl * ll)
        rc2_ref[...] = m * (su * lu)
        newton()
        dsl = dsl_ref[...]
        dsu = dsu_ref[...]
        dll = dll_ref[...]
        dlu = dlu_ref[...]
        a_aff = jnp.minimum(jnp.minimum(max_step(sl, dsl), max_step(su, dsu)),
                            jnp.minimum(max_step(ll, dll), max_step(lu, dlu)))
        mu_aff = (jnp.sum(m * ((sl + a_aff * dsl) * (ll + a_aff * dll)
                               + (su + a_aff * dsu) * (lu + a_aff * dlu)),
                          axis=(0, 1)) / (2.0 * n_active))
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        # Corrector (reuses the factorization; only the vector pass reruns).
        sg = jnp.reshape(sigma, (1, 1) + sigma.shape[-1:])
        mu3 = jnp.reshape(mu, (1, 1) + mu.shape[-1:])
        rc1_ref[...] = m * (sl * ll + dsl * dll - sg * mu3)
        rc2_ref[...] = m * (su * lu + dsu * dlu - sg * mu3)
        newton()
        dsl = dsl_ref[...]
        dsu = dsu_ref[...]
        dll = dll_ref[...]
        dlu = dlu_ref[...]
        a = jnp.minimum(jnp.minimum(max_step(sl, dsl), max_step(su, dsu)),
                        jnp.minimum(max_step(ll, dll), max_step(lu, dlu)))
        # Convergence freeze + stationarity step guard (ocpqp parity).
        a = a * jnp.where((mu > mu_tol) | (stat_old > 1e3 * mu_tol), 1.0, 0.0)
        stat_new = stat_at(a)
        ok = stat_new <= 10.0 * (stat_old + mu)
        a = a * jnp.where(ok, 1.0, 0.0)

        dx_ref[...] = dx_ref[...] + a * ddx_ref[...]
        du_ref[...] = du_ref[...] + a * ddu_ref[...]
        sl_ref[...] = jnp.where(m > 0, sl + a * dsl, 1.0)
        su_ref[...] = jnp.where(m > 0, su + a * dsu, 1.0)
        ll_ref[...] = jnp.where(m > 0, ll + a * dll, 0.0)
        lu_ref[...] = jnp.where(m > 0, lu + a * dlu, 0.0)
        return (jnp.where(ok, stat_new, stat_old), mu)

    stat_f, mu_f = jax.lax.fori_loop(
        0, iters, ipm_iter,
        (stat0, jnp.full((LANE_B,), _BIG, f32)))

    dx_o[0] = dx_ref[...]
    du_o[0] = du_ref[...]
    sl_o[0] = sl_ref[...]
    su_o[0] = su_ref[...]
    ll_o[0] = ll_ref[...]
    lu_o[0] = lu_ref[...]
    diag_o[0] = jnp.stack([mu_f, stat_f])


def _tile(x, T):
    """(batch, ...) -> (T, ..., B): split the batch into lane-tiles."""
    x = jnp.reshape(x, (T, LANE_B) + x.shape[1:])
    return jnp.moveaxis(x, 1, -1)


def _untile(x):
    """(T, ..., B) -> (batch, ...)."""
    x = jnp.moveaxis(x, -1, 1)
    return jnp.reshape(x, (x.shape[0] * LANE_B,) + x.shape[2:])


@functools.partial(jax.jit, static_argnames=("settings", "interpret"))
def solve_ocp_qp_fleet(data: OcpQpData, settings=None,
                       interpret: bool = False) -> OcpQpSolution:
    """Batched QP solve on BATCH-LEADING data (every leaf of ``data`` except
    ``con.C``/``con.D`` carries a leading batch axis; C/D are batch-shared).
    Batch must be a multiple of ``LANE_B`` (pad upstream). See the module
    docstring for scope; gains in the result are NaN by design."""
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    if settings is None:
        settings = IpmSettings()
    dyn, cost, con = data.dyn, data.cost, data.con
    batch = data.dx0.shape[0]
    assert batch % LANE_B == 0, f"batch {batch} not a multiple of {LANE_B}"
    T = batch // LANE_B
    N = dyn.A.shape[1]
    nx = dyn.A.shape[-1]
    nu = dyn.B.shape[-1]
    ng = con.C.shape[-2]
    f32 = jnp.float32
    mu_tol = settings.mu_tol if settings.mu_tol > 0 else 1e-4
    w_max = min(settings.w_max, 1e6)

    nxu = nx + nu
    nxu_p, nx_p, nu_p = _r8(nxu), _r8(nx), _r8(nu)

    def pad_last(x, to):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])])

    M = _tile(pad_last(jnp.concatenate([dyn.A, dyn.B], axis=-1),
                       nxu_p).astype(f32), T)
    Q = _tile(pad_last(cost.Q, nx_p).astype(f32), T)
    S = _tile(pad_last(cost.S, nx_p).astype(f32), T)
    R = _tile(pad_last(cost.R, nu_p).astype(f32), T)
    vec = _tile(pad_last(jnp.concatenate(
        [dyn.b, cost.q[:, :-1], cost.r], axis=-1),
        _r8(2 * nx + nu)).astype(f32), T)
    qN = _tile(cost.q[:, -1].astype(f32), T)
    lg = _tile(con.lg.astype(f32), T)
    ug = _tile(con.ug.astype(f32), T)
    msk = _tile(con.mask.astype(f32), T)
    dx0 = _tile(data.dx0.astype(f32), T)
    Cs = jnp.asarray(con.C, f32)  # (N+1, ng, nx) shared
    Ds = jnp.asarray(con.D, f32)

    kern = functools.partial(
        _fleet_kernel, N=N, nx=nx, nu=nu, ng=ng, iters=int(settings.iters),
        tau=float(settings.tau), mu0=float(settings.mu0),
        s0_min=float(settings.s0_min), reg=float(settings.reg),
        w_max=float(w_max), mu_tol=float(mu_tol))

    B = LANE_B
    nv_p = _r8(2 * nx + nu)

    def blk(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda t: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def shared_blk(shape):
        return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec] * 5 + [
        blk((nx, B)), blk((N + 1, ng, B)), blk((N + 1, ng, B)),
        blk((N + 1, ng, B)), blk((nx, B)),
        shared_blk((N + 1, ng, nx)), shared_blk((N + 1, ng, nu)),
    ]
    out_specs = (
        blk((N + 1, nx, B)), blk((N, nu, B)),
        blk((N + 1, ng, B)), blk((N + 1, ng, B)),
        blk((N + 1, ng, B)), blk((N + 1, ng, B)),
        blk((2, B)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((T, N + 1, nx, B), f32),  # dx
        jax.ShapeDtypeStruct((T, N, nu, B), f32),  # du
        jax.ShapeDtypeStruct((T, N + 1, ng, B), f32),  # s_l
        jax.ShapeDtypeStruct((T, N + 1, ng, B), f32),  # s_u
        jax.ShapeDtypeStruct((T, N + 1, ng, B), f32),  # lam_l
        jax.ShapeDtypeStruct((T, N + 1, ng, B), f32),  # lam_u
        jax.ShapeDtypeStruct((T, 2, B), f32),  # [mu, stat]
    )
    scratch = [
        pltpu.VMEM((N + 1, nx, B), f32),  # dx
        pltpu.VMEM((N, nu, B), f32),  # du
        pltpu.VMEM((N + 1, ng, B), f32),  # s_l
        pltpu.VMEM((N + 1, ng, B), f32),  # s_u
        pltpu.VMEM((N + 1, ng, B), f32),  # lam_l
        pltpu.VMEM((N + 1, ng, B), f32),  # lam_u
        pltpu.VMEM((N + 1, ng, B), f32),  # r_l
        pltpu.VMEM((N + 1, ng, B), f32),  # r_u
        pltpu.VMEM((N + 1, ng, B), f32),  # lam_net / w rows
        pltpu.VMEM((N + 1, ng, B), f32),  # rc1
        pltpu.VMEM((N + 1, ng, B), f32),  # rc2
        pltpu.VMEM((N + 1, nx, B), f32),  # gq
        pltpu.VMEM((N, nu, B), f32),  # gr
        pltpu.VMEM((N, nx, B), f32),  # rd
        pltpu.VMEM((N, nx, B), f32),  # Prd
        pltpu.VMEM((N, nu, B), f32),  # kv
        pltpu.VMEM((N + 1, nx, B), f32),  # ddx
        pltpu.VMEM((N, nu, B), f32),  # ddu
        pltpu.VMEM((N + 1, ng, B), f32),  # ds_l
        pltpu.VMEM((N + 1, ng, B), f32),  # ds_u
        pltpu.VMEM((N + 1, ng, B), f32),  # dlam_l
        pltpu.VMEM((N + 1, ng, B), f32),  # dlam_u
        pltpu.VMEM((N, nu, nx, B), f32),  # K (VMEM-resident)
        pltpu.VMEM((N, nu, nu, B), f32),  # Ginv (VMEM-resident)
        pltpu.VMEM((nx, nx, B), f32),  # P roll
        pltpu.VMEM((N, nx, nxu_p, B), f32),  # M (full tile, resident)
        pltpu.VMEM((N + 1, nx, nx_p, B), f32),  # Q
        pltpu.VMEM((N, nu, nx_p, B), f32),  # S
        pltpu.VMEM((N, nu, nu_p, B), f32),  # R
        pltpu.VMEM((N, nv_p, B), f32),  # vec
        pltpu.SemaphoreType.DMA((5,)),
    ]
    (dx_t, du_t, sl_t, su_t, ll_t, lu_t, diag_t) = pl.pallas_call(
        kern,
        grid=(T,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        # ~60 MB peak (double-buffered tile data blocks + resident factors
        # + Mosaic stack) — far above the compiler's conservative 16 MB
        # scoped default, comfortably inside the chip's measured VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(M, Q, S, R, vec, qN, lg, ug, msk, dx0, Cs, Ds)

    dx = _untile(dx_t)
    du = _untile(du_t)
    s_l = _untile(sl_t)
    s_u = _untile(su_t)
    lam_l = _untile(ll_t)
    lam_u = _untile(lu_t)
    diag = _untile(diag_t)  # (batch, 2)

    # Cheap per-problem diagnostics (all elementwise/batched — no scan
    # chains; stat comes from the kernel's own final guard evaluation).
    from cheeta_mpc_tpu.ops.riccati import bmv
    mcast = con.mask.astype(f32)
    du_pad = jnp.concatenate([du, jnp.zeros_like(du[:, :1])], axis=1)
    g = (jnp.einsum('ngi,bni->bng', Cs, dx)
         + jnp.einsum('ngi,bni->bng', Ds, du_pad))
    viol = jnp.maximum(con.lg - g, g - con.ug)
    ineq_res = jnp.max(jnp.where(mcast > 0, viol, 0.0), axis=(1, 2))
    r_dyn = (bmv(dyn.A, dx[:, :-1]) + bmv(dyn.B, du) + dyn.b - dx[:, 1:])
    eq_res = jnp.max(jnp.abs(r_dyn), axis=(1, 2))
    nanK = jnp.full((batch, N, nu, nx), np.nan, f32)
    nank = jnp.full((batch, N, nu), np.nan, f32)
    nanP = jnp.full((batch, N + 1, nx, nx), np.nan, f32)
    nanp = jnp.full((batch, N + 1, nx), np.nan, f32)
    return OcpQpSolution(
        dx=dx, du=du,
        gains=RiccatiGains(K=nanK, k=nank, P=nanP, p=nanp),
        lam_l=lam_l, lam_u=lam_u, s_l=s_l, s_u=s_u,
        iterations=jnp.full((batch,), settings.iters, jnp.int32),
        mu=diag[:, 0], stat_res=diag[:, 1], ineq_res=ineq_res,
        eq_res=eq_res)


def make_fleet_qp_solver(settings, interpret: bool = False):
    """A QP solver that is the fused batch-1 kernel when called directly and
    the lane-batched fleet kernel under ``jax.vmap`` — one ``qp_backend``
    covering both the real-time and the fleet path.

    The vmap rule falls back to a plain ``jax.vmap`` of the scan solver when
    the workload is outside the fleet kernel's scope: per-problem C/D, stage
    equalities, f64, no inequalities, or a batch not divisible by LANE_B.
    """
    from jax.custom_batching import custom_vmap

    from cheeta_mpc_tpu.ops.ocpqp import solve_ocp_qp
    from cheeta_mpc_tpu.ops.pallas_ipm_riccati import pallas_solve_ocp_qp

    @custom_vmap
    def qp_solve(data):
        return pallas_solve_ocp_qp(data, settings, interpret=interpret)

    @qp_solve.def_vmap
    def _rule(axis_size, in_batched, data):
        # custom_vmap hands in_batched as a sequence aligned with the args.
        db = in_batched[0] if isinstance(in_batched, (list, tuple)) \
            else in_batched
        shared_cd = (data.con is not None
                     and not db.con.C and not db.con.D)
        in_scope = (data.con is not None and data.eq is None
                    and data.dx0.dtype != jnp.float64
                    and shared_cd and axis_size % LANE_B == 0)

        def bcast(x, b):
            if x is None:
                return None
            return x if b else jnp.broadcast_to(
                jnp.asarray(x)[None], (axis_size,) + jnp.shape(x))

        if in_scope:
            dyn = data.dyn.replace(A=bcast(data.dyn.A, db.dyn.A),
                                   B=bcast(data.dyn.B, db.dyn.B),
                                   b=bcast(data.dyn.b, db.dyn.b))
            cost = data.cost.replace(
                Q=bcast(data.cost.Q, db.cost.Q),
                q=bcast(data.cost.q, db.cost.q),
                R=bcast(data.cost.R, db.cost.R),
                r=bcast(data.cost.r, db.cost.r),
                S=bcast(data.cost.S, db.cost.S))
            con = data.con.replace(
                lg=bcast(data.con.lg, db.con.lg),
                ug=bcast(data.con.ug, db.con.ug),
                mask=bcast(data.con.mask, db.con.mask))
            bdata = data.replace(dyn=dyn, cost=cost, con=con,
                                 dx0=bcast(data.dx0, db.dx0))
            out = solve_ocp_qp_fleet(bdata, settings, interpret=interpret)
        else:
            full = jax.tree.map(
                lambda x, b: bcast(x, b), data, db,
                is_leaf=lambda x: x is None)
            out = jax.vmap(lambda d: solve_ocp_qp(d, settings))(full)
        out_batched = jax.tree.map(lambda _: True, out)
        return out, out_batched

    return qp_solve
