"""Fused Riccati-structured interior-point OCP-QP solver as ONE Pallas kernel.

The batch-1 latency of the inequality-constrained solve is dominated by the
XLA op-chain of the IPM loop: each Mehrotra iteration issues a stage-serial
Riccati factorization plus two vector/forward passes as hundreds of small
HBM-round-tripping ops (~1.4 ms/iteration measured, PERF.md
"Sequential-latency analysis"). This kernel fuses the ENTIRE fixed-iteration
Mehrotra predictor-corrector of :func:`cheeta_mpc_tpu.ops.ocpqp.solve_ocp_qp`
— same init, same barrier algebra, same fraction-to-boundary, convergence
freeze and stationarity step guard — into a single ``pallas_call`` whose
working set (iterate, slacks/duals, Riccati factors) stays VMEM-resident for
all iterations. HBM traffic is the problem data in and the solution out,
once.

Unlike ``ops/pallas_ipm.py`` (the dense condensed-space kernel), the
factorization here is the structure-exploiting Riccati recursion — O(N)
small-block work instead of a dense (N*nu)^2 Cholesky — so the same kernel
that wins at batch 1 stays FLOP-competitive at large batch (the reference's
HPIPM makes the same choice with ric_alg=0, HpipmInterfaceSettings.h:56;
BLASFEO plays the role this kernel plays here, SURVEY.md L0).

Scope: inequality-constrained f32 OCP-QPs (``data.con`` set), with or
without masked stage equalities (``data.eq``) — the equality rows are
eliminated exactly inside the same backward recursion (the masked
eq-Riccati elimination of ``ops/riccati.riccati_factorize_eq``, fused), so
the legged pyramid-cone mode (stance/swing equalities + hard friction
pyramids) gets the fused batch-1 path too, matching HPIPM's single native
IPM handling both row types (HpipmInterface.cpp:223-264). f64 problems fall
back to the scan-based solver (no silent downcast) with an explicit
trace-time warning.

Conventions follow ops/pallas_riccati.py: single grid point, vectors as
(1, n) rows, ``fori_loop`` over stages and over IPM iterations, SPD inverses
via masked Gauss-Jordan (no dynamic pivot indexing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cheeta_mpc_tpu.core.types import OcpQpData, OcpQpSolution, RiccatiGains
from cheeta_mpc_tpu.ops.pallas_riccati import spd_inverse_kernel


def _ipm_kernel(*refs, N, nx, nu, ng, nc, iters, tau, mu0, s0_min, reg, eps,
                w_max, mu_tol):
    if nc:
        (A_ref, B_ref, b_ref, Q_ref, q_ref, R_ref, r_ref, S_ref,
         C_ref, D_ref, lg_ref, ug_ref, m_ref,
         Ce_ref, De_ref, e_ref, me_ref, dx0_ref,
         # outputs
         dx_ref, du_ref, sl_ref, su_ref, ll_ref, lu_ref,
         K_ref, kv_ref, P_ref, p_ref, diag_ref,
         # scratch (Gi_ref holds the REDUCED inverse W when nc > 0)
         Gi_ref, H_ref, g_ref, rd_ref, rl_ref, ru_ref, ln_ref,
         ddx_ref, ddu_ref, dg_ref, dsl_ref, dsu_ref, dll_ref, dlu_ref,
         re_ref, YLi_ref, Li_ref, LiD_ref) = refs
    else:
        (A_ref, B_ref, b_ref, Q_ref, q_ref, R_ref, r_ref, S_ref,
         C_ref, D_ref, lg_ref, ug_ref, m_ref, dx0_ref,
         dx_ref, du_ref, sl_ref, su_ref, ll_ref, lu_ref,
         K_ref, kv_ref, P_ref, p_ref, diag_ref,
         Gi_ref, H_ref, g_ref, rd_ref, rl_ref, ru_ref, ln_ref,
         ddx_ref, ddu_ref, dg_ref, dsl_ref, dsu_ref, dll_ref,
         dlu_ref) = refs
    f32 = jnp.float32
    eye_u = jnp.eye(nu, dtype=f32)
    eye_c = jnp.eye(nc, dtype=f32) if nc else None
    m = m_ref[...]  # (N+1, ng) activity mask
    lg = lg_ref[...]
    ug = ug_ref[...]
    n_active = jnp.maximum(jnp.sum(m), 1.0)

    def mm(a, b):
        # precision=HIGHEST: TPU MXU f32 "matmul" defaults to one bf16 pass
        # (~8-bit mantissa), which under barrier conditioning (~1/mu) wrecks
        # the late IPM iterations; HIGHEST requests the multi-pass f32
        # algorithm. These matmuls are tiny and latency-bound, so the extra
        # passes are free.
        return jnp.dot(a, b, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)

    def row(ref, k):
        return ref[pl.ds(k, 1)]  # (1, n)

    def spd_inverse(M, n):
        """Equilibrated Gauss-Jordan (shared with the eq-Riccati kernel,
        which documents why no Newton refinement: it makes the f32 inverse
        worse at the ~1/mu condition this barrier reaches)."""
        return spd_inverse_kernel(M, n,
                                  precision=jax.lax.Precision.HIGHEST)

    # ---- initialization (matches solve_ocp_qp: g(0,0) = 0) -----------------
    sl0 = jnp.where(m > 0, jnp.maximum(-lg, s0_min), 1.0)
    su0 = jnp.where(m > 0, jnp.maximum(ug, s0_min), 1.0)
    sl_ref[...] = sl0
    su_ref[...] = su0
    ll_ref[...] = jnp.where(m > 0, mu0 / sl0, 0.0)
    lu_ref[...] = jnp.where(m > 0, mu0 / su0, 0.0)
    dx_ref[...] = jnp.zeros((N + 1, nx), f32)
    du_ref[...] = jnp.zeros((N, nu), f32)

    if nc:
        # Least-squares equality-dual operator for the stationarity metric
        # (ocpqp.solve_ocp_qp precomputes the same LiD once: constraint
        # matrices do not change across IPM iterations).
        def lid_body(k, _):
            Dk = De_ref[k]  # (nc, nu)
            mk = row(me_ref, k)  # (1, nc)
            DDt = mm(Dk, Dk.T) + eye_c * (1.0 - mk)
            LiD_ref[k] = mm(spd_inverse(0.5 * (DDt + DDt.T), nc), Dk)
            return 0

        jax.lax.fori_loop(0, N, lid_body, 0)

    # ---- input-space KKT stationarity at (state + a * delta) ---------------
    # (ocpqp._stationarity_norm: adjoint recursion with least-squares
    # equality duals, max |r_u|.)
    def stat_at(a):
        ln_ref[...] = m * ((lu_ref[...] + a * dlu_ref[...])
                           - (ll_ref[...] + a * dll_ref[...]))
        xN = row(dx_ref, N) + a * row(ddx_ref, N)
        qbarN = (row(q_ref, N) + mm(xN, Q_ref[N].T)
                 + mm(row(ln_ref, N), C_ref[N]))

        def body(i, carry):
            k = N - 1 - i
            mu_next, smax = carry
            xk = row(dx_ref, k) + a * row(ddx_ref, k)
            uk = row(du_ref, k) + a * row(ddu_ref, k)
            lnk = row(ln_ref, k)
            qbar = (row(q_ref, k) + mm(xk, Q_ref[k].T) + mm(uk, S_ref[k])
                    + mm(lnk, C_ref[k]))
            gr = (row(r_ref, k) + mm(uk, R_ref[k].T) + mm(xk, S_ref[k].T)
                  + mm(lnk, D_ref[k]))
            t_u = gr + mm(mu_next, B_ref[k])
            if nc:
                nuv = -mm(t_u, LiD_ref[k].T)  # (1, nc)
                t_u = t_u + mm(nuv, De_ref[k])
                qbar = qbar + mm(nuv, Ce_ref[k])
            smax = jnp.maximum(smax, jnp.max(jnp.abs(t_u)))
            return (qbar + mm(mu_next, A_ref[k]), smax)

        _, smax = jax.lax.fori_loop(0, N, body, (qbarN, f32(0.0)))
        return smax

    # Zero the deltas so stat_at(0) evaluates the initial iterate.
    ddx_ref[...] = jnp.zeros((N + 1, nx), f32)
    ddu_ref[...] = jnp.zeros((N, nu), f32)
    dll_ref[...] = jnp.zeros((N + 1, ng), f32)
    dlu_ref[...] = jnp.zeros((N + 1, ng), f32)
    stat0 = stat_at(f32(0.0))

    # ---- per-iteration building blocks -------------------------------------
    def compute_residuals():
        """g_ref <- C dx + D du ; rd_ref <- dynamics residual ;
        re_ref <- masked equality residual (shared by predictor+corrector)."""

        def body(k, _):
            xk = row(dx_ref, k)
            uk = row(du_ref, k)
            g_ref[pl.ds(k, 1)] = mm(xk, C_ref[k].T) + mm(uk, D_ref[k].T)
            rd_ref[pl.ds(k, 1)] = (mm(xk, A_ref[k].T) + mm(uk, B_ref[k].T)
                                   + row(b_ref, k) - row(dx_ref, k + 1))
            if nc:
                re_ref[pl.ds(k, 1)] = row(me_ref, k) * (
                    mm(xk, Ce_ref[k].T) + mm(uk, De_ref[k].T) + row(e_ref, k))
            return 0

        jax.lax.fori_loop(0, N, body, 0)
        g_ref[pl.ds(N, 1)] = mm(row(dx_ref, N), C_ref[N].T)

    def factorize():
        """Backward Riccati with the barrier-augmented Hessian blocks
        Qb = Q + C' diag(w) C (and Rb, Sb with D) and exact elimination of
        the masked stage equalities (riccati_factorize_eq fused in); stores
        K, W (in Gi_ref), YLi, Li, H, P."""
        w = m * jnp.minimum(ll_ref[...] / sl_ref[...]
                            + lu_ref[...] / su_ref[...], w_max)
        ln_ref[...] = w  # reuse as the w row store for the stage loop
        QN = Q_ref[N]
        CN = C_ref[N]
        P_ref[N] = 0.5 * (QN + QN.T) + mm(CN.T * row(ln_ref, N), CN)

        def body(i, _):
            k = N - 1 - i
            wk = row(ln_ref, k)  # (1, ng)
            Ck = C_ref[k]
            Dk = D_ref[k]
            CtW = Ck.T * wk  # (nx, ng)
            DtW = Dk.T * wk  # (nu, ng)
            Qb = Q_ref[k] + mm(CtW, Ck)
            Rb = R_ref[k] + mm(DtW, Dk)
            Sb = S_ref[k] + mm(DtW, Ck)
            P_next = P_ref[k + 1]
            Ak = A_ref[k]
            Bk = B_ref[k]
            PA = mm(P_next, Ak)
            PB = mm(P_next, Bk)
            G = Rb + mm(Bk.T, PB) + reg * eye_u
            Hk = Sb + mm(Bk.T, PA)
            Gi = spd_inverse(0.5 * (G + G.T), nu)
            if nc:
                Cek = Ce_ref[k]  # (nc, nx)
                Dek = De_ref[k]  # (nc, nu)
                mek = row(me_ref, k)  # (1, nc)
                Y = mm(Gi, Dek.T)  # (nu, nc)
                Lam = mm(Dek, Y) + eye_c * (eps * (1.0 - mek))
                Li = spd_inverse(0.5 * (Lam + Lam.T), nc)
                YLi = mm(Y, Li)
                W = Gi - mm(YLi, Y.T)
                Kk = -(mm(W, Hk) + mm(YLi, Cek))
                Pk = (Qb + mm(Ak.T, PA) + mm(Hk.T, Kk)
                      + mm(Cek.T, mm(Li, Cek - mm(Y.T, Hk))))
                YLi_ref[k] = YLi
                Li_ref[k] = Li
                Gi_ref[k] = W
            else:
                Kk = -mm(Gi, Hk)
                Pk = Qb + mm(Ak.T, PA) + mm(Hk.T, Kk)
                Gi_ref[k] = Gi
            P_ref[k] = 0.5 * (Pk + Pk.T)
            K_ref[k] = Kk
            H_ref[k] = Hk
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    def newton(rcl, rcu, r_x0_row):
        """One Newton direction against the stored factors
        (ocpqp._solve_newton): backward vector pass (with equality RHS
        h = -r_eq, riccati_vector_eq), forward rollout, slack/dual deltas.
        Writes ddx/ddu/dsl/dsu/dll/dlu (+ kv, p)."""
        sl = sl_ref[...]
        su = su_ref[...]
        ll = ll_ref[...]
        lu = lu_ref[...]
        rl = rl_ref[...]
        ru = ru_ref[...]
        beta = m * ((ll / sl) * rl + (lu / su) * ru + rcl / sl - rcu / su)
        ln_ref[...] = m * (lu - ll + beta)

        xN = row(dx_ref, N)
        qbarN = (row(q_ref, N) + mm(xN, Q_ref[N].T)
                 + mm(row(ln_ref, N), C_ref[N]))
        p_ref[pl.ds(N, 1)] = qbarN

        def bwd(i, p_next):
            k = N - 1 - i
            xk = row(dx_ref, k)
            uk = row(du_ref, k)
            lnk = row(ln_ref, k)
            qbar = (row(q_ref, k) + mm(xk, Q_ref[k].T) + mm(uk, S_ref[k])
                    + mm(lnk, C_ref[k]))
            rbar = (row(r_ref, k) + mm(uk, R_ref[k].T) + mm(xk, S_ref[k].T)
                    + mm(lnk, D_ref[k]))
            mvec = p_next + mm(row(rd_ref, k), P_ref[k + 1].T)
            rhs = rbar + mm(mvec, B_ref[k])
            if nc:
                h_row = -row(re_ref, k)  # (1, nc) — already masked
                Wk = Gi_ref[k]
                YLik = YLi_ref[k]
                kvk = -(mm(rhs, Wk.T) - mm(h_row, YLik.T))
                nu0 = -(mm(h_row, Li_ref[k].T) + mm(rhs, YLik))
                pk = (qbar + mm(mvec, A_ref[k]) + mm(kvk, H_ref[k])
                      + mm(nu0, Ce_ref[k]))
            else:
                kvk = -mm(rhs, Gi_ref[k].T)
                pk = qbar + mm(mvec, A_ref[k]) + mm(rhs, K_ref[k])
            kv_ref[pl.ds(k, 1)] = kvk
            p_ref[pl.ds(k, 1)] = pk
            return pk

        jax.lax.fori_loop(0, N, bwd, qbarN)

        ddx_ref[pl.ds(0, 1)] = r_x0_row

        def fwd(k, _):
            xk = row(ddx_ref, k)
            uk = mm(xk, K_ref[k].T) + row(kv_ref, k)
            ddu_ref[pl.ds(k, 1)] = uk
            ddx_ref[pl.ds(k + 1, 1)] = (mm(xk, A_ref[k].T)
                                        + mm(uk, B_ref[k].T)
                                        + row(rd_ref, k))
            dg_ref[pl.ds(k, 1)] = mm(xk, C_ref[k].T) + mm(uk, D_ref[k].T)
            return 0

        jax.lax.fori_loop(0, N, fwd, 0)
        dg_ref[pl.ds(N, 1)] = mm(row(ddx_ref, N), C_ref[N].T)

        dg = dg_ref[...]
        dsl = m * (dg + rl)
        dsu = m * (-dg - ru)
        dsl_ref[...] = dsl
        dsu_ref[...] = dsu
        dll_ref[...] = -m * (rcl + ll * dsl) / sl
        dlu_ref[...] = -m * (rcu + lu * dsu) / su

    def max_step(v, dv):
        """Largest alpha <= 1 with v + alpha dv >= (1 - tau) v on active
        rows (ocpqp._max_step)."""
        ratio = jnp.where((dv < 0) & (m > 0),
                          -tau * v / jnp.minimum(dv, -1e-30), np.inf)
        return jnp.minimum(1.0, jnp.min(ratio))

    # ---- the fused Mehrotra loop -------------------------------------------
    def ipm_iter(it, carry):
        stat_old, _ = carry
        compute_residuals()
        sl = sl_ref[...]
        su = su_ref[...]
        ll = ll_ref[...]
        lu = lu_ref[...]
        g = g_ref[...]
        rl_ref[...] = g - sl - lg
        ru_ref[...] = g + su - ug
        r_x0 = dx0_ref[...] - row(dx_ref, 0)
        mu = jnp.sum(m * (sl * ll + su * lu)) / (2.0 * n_active)

        factorize()

        # Predictor (affine direction, sigma = 0).
        newton(m * (sl * ll), m * (su * lu), r_x0)
        dsl = dsl_ref[...]
        dsu = dsu_ref[...]
        dll = dll_ref[...]
        dlu = dlu_ref[...]
        a_aff = jnp.minimum(jnp.minimum(max_step(sl, dsl), max_step(su, dsu)),
                            jnp.minimum(max_step(ll, dll), max_step(lu, dlu)))
        mu_aff = (jnp.sum(m * ((sl + a_aff * dsl) * (ll + a_aff * dll)
                               + (su + a_aff * dsu) * (lu + a_aff * dlu)))
                  / (2.0 * n_active))
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        # Corrector (reuses the factorization; only the vector pass reruns).
        rcl_c = m * (sl * ll + dsl * dll - sigma * mu)
        rcu_c = m * (su * lu + dsu * dlu - sigma * mu)
        newton(rcl_c, rcu_c, r_x0)
        dsl = dsl_ref[...]
        dsu = dsu_ref[...]
        dll = dll_ref[...]
        dlu = dlu_ref[...]
        a = jnp.minimum(jnp.minimum(max_step(sl, dsl), max_step(su, dsu)),
                        jnp.minimum(max_step(ll, dll), max_step(lu, dlu)))
        # Convergence freeze (see solve_ocp_qp): zero step once mu < mu_tol
        # unless stationarity is still unresolved.
        a = a * jnp.where((mu > mu_tol) | (stat_old > 1e3 * mu_tol), 1.0, 0.0)
        # Stationarity step guard: reject steps that grow the KKT
        # stationarity by >10x (NaN comparisons are false -> NaN rejected).
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

    stat_f, mu_f = jax.lax.fori_loop(0, iters, ipm_iter,
                                     (stat0, f32(np.inf)))
    diag_ref[...] = jnp.stack([mu_f, stat_f])[None, :]


@functools.partial(jax.jit, static_argnames=("settings", "interpret"))
def pallas_solve_ocp_qp(data: OcpQpData, settings=None,
                        interpret: bool = False) -> OcpQpSolution:
    """Drop-in fused-kernel replacement for
    :func:`cheeta_mpc_tpu.ops.ocpqp.solve_ocp_qp` on inequality-constrained
    f32 problems, with or without masked stage equalities. Falls back to the
    scan solver — with an explicit trace-time warning — for f64 problems or
    problems with no inequality rows (no silent downcast / silent scope
    change)."""
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings, solve_ocp_qp
    if settings is None:
        settings = IpmSettings()
    if data.con is None or data.dx0.dtype == jnp.float64:
        import warnings
        warnings.warn(
            "pallas_solve_ocp_qp: falling back to the scan solver "
            f"(con={'set' if data.con is not None else 'None'}, "
            f"dtype={data.dx0.dtype}) — the fused kernel covers "
            "inequality-constrained f32 problems only", stacklevel=2)
        return solve_ocp_qp(data, settings)

    dyn, cost, con = data.dyn, data.cost, data.con
    N, nx, nu = dyn.horizon, dyn.nx, dyn.nu
    ng = con.ng
    nc = 0 if data.eq is None else data.eq.nc
    f32 = jnp.float32
    # f32 clamps exactly as solve_ocp_qp applies them.
    mu_tol = settings.mu_tol if settings.mu_tol > 0 else 1e-4
    w_max = min(settings.w_max, 1e6)

    kern = functools.partial(
        _ipm_kernel, N=N, nx=nx, nu=nu, ng=ng, nc=nc,
        iters=int(settings.iters),
        tau=float(settings.tau), mu0=float(settings.mu0),
        s0_min=float(settings.s0_min), reg=float(settings.reg),
        eps=1.0,  # eq dual regularization, riccati_factorize_eq default
        w_max=float(w_max), mu_tol=float(mu_tol))
    out_shape = (
        jax.ShapeDtypeStruct((N + 1, nx), f32),  # dx
        jax.ShapeDtypeStruct((N, nu), f32),  # du
        jax.ShapeDtypeStruct((N + 1, ng), f32),  # s_l
        jax.ShapeDtypeStruct((N + 1, ng), f32),  # s_u
        jax.ShapeDtypeStruct((N + 1, ng), f32),  # lam_l
        jax.ShapeDtypeStruct((N + 1, ng), f32),  # lam_u
        jax.ShapeDtypeStruct((N, nu, nx), f32),  # K
        jax.ShapeDtypeStruct((N, nu), f32),  # k
        jax.ShapeDtypeStruct((N + 1, nx, nx), f32),  # P
        jax.ShapeDtypeStruct((N + 1, nx), f32),  # p
        jax.ShapeDtypeStruct((1, 2), f32),  # [mu, stat]
    )
    scratch = [
        pltpu.VMEM((N, nu, nu), f32),  # Ginv / reduced inverse W
        pltpu.VMEM((N, nu, nx), f32),  # H
        pltpu.VMEM((N + 1, ng), f32),  # g
        pltpu.VMEM((N, nx), f32),  # r_dyn
        pltpu.VMEM((N + 1, ng), f32),  # r_l
        pltpu.VMEM((N + 1, ng), f32),  # r_u
        pltpu.VMEM((N + 1, ng), f32),  # lam_net / barrier w
        pltpu.VMEM((N + 1, nx), f32),  # ddx
        pltpu.VMEM((N, nu), f32),  # ddu
        pltpu.VMEM((N + 1, ng), f32),  # dg
        pltpu.VMEM((N + 1, ng), f32),  # ds_l
        pltpu.VMEM((N + 1, ng), f32),  # ds_u
        pltpu.VMEM((N + 1, ng), f32),  # dlam_l
        pltpu.VMEM((N + 1, ng), f32),  # dlam_u
    ]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    args = (dyn.A, dyn.B, dyn.b, cost.Q, cost.q, cost.R, cost.r, cost.S,
            con.C, con.D, con.lg, con.ug, con.mask)
    if nc:
        eq = data.eq
        mask_e = eq.mask
        args = args + (eq.C * mask_e[..., None], eq.D * mask_e[..., None],
                       eq.e * mask_e, mask_e)
        scratch += [
            pltpu.VMEM((N, nc), f32),  # r_eq
            pltpu.VMEM((N, nu, nc), f32),  # Y Lam^{-1}
            pltpu.VMEM((N, nc, nc), f32),  # Lam^{-1}
            pltpu.VMEM((N, nc, nu), f32),  # LiD (stationarity duals)
        ]
    args = args + (data.dx0[None],)
    args = tuple(jnp.asarray(a, f32) for a in args)
    (dx, du, s_l, s_u, lam_l, lam_u, K, kvec, P, p, diag) = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[vspec] * len(args),
        out_specs=tuple([vspec] * len(out_shape)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)

    # Final diagnostics in XLA outside the kernel — identical formulas to
    # solve_ocp_qp's tail; XLA dead-code-eliminates them in consumers (the
    # SQP loop) that only read the primal/gains/duals.
    from cheeta_mpc_tpu.ops.ocpqp import (_IpmState, _constraint_values,
                                          _costate_correction, _grad_at, bmv,
                                          bmv_t)
    state = _IpmState(dx, du, s_l, s_u, lam_l, lam_u)
    m = con.mask.astype(f32)
    g = _constraint_values(con, dx, du)
    viol = jnp.maximum(con.lg - g, g - con.ug)
    ineq_res = jnp.max(jnp.where(m > 0, viol, 0.0)) if ng > 0 else 0.0
    r_dyn = (bmv(dyn.A, dx[:-1]) + bmv(dyn.B, du) + dyn.b - dx[1:])
    _, gr = _grad_at(cost, dx, du)
    lam_net = m * (lam_u - lam_l)
    stat_u = gr + bmv_t(con.D[:-1], lam_net[:-1])
    data32 = data.replace(con=con.replace(mask=m))
    stat_res = jnp.max(jnp.abs(stat_u + _costate_correction(data32, state,
                                                            lam_net)))
    return OcpQpSolution(
        dx=dx, du=du, gains=RiccatiGains(K=K, k=kvec, P=P, p=p),
        lam_l=lam_l, lam_u=lam_u, s_l=s_l, s_u=s_u,
        iterations=jnp.asarray(settings.iters, jnp.int32), mu=diag[0, 0],
        stat_res=stat_res, ineq_res=ineq_res,
        eq_res=jnp.max(jnp.abs(r_dyn)))
