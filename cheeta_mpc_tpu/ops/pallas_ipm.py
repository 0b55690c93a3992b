"""Fused dense Mehrotra IPM as a single Pallas TPU kernel.

The condensed QP backend (:mod:`cheeta_mpc_tpu.ops.condensed`, the analogue
of HPIPM's condensing mode driven from the reference at
``ocs2_sqp/hpipm_catkin/src/HpipmInterface.cpp:281-301``) already turned the
per-iteration linear algebra into dense MXU work, but each IPM iteration is
still a chain of separate XLA ops (GEMM, Cholesky, four triangular solves,
a dozen vector ops) whose issue overhead dominates batch-1 latency
(PERF.md "Sequential-latency analysis" named the in-kernel IPM as the
remaining lever). This kernel fuses the ENTIRE interior-point solve — every
iteration: barrier Hessian assembly, factorization, predictor, corrector,
fraction-to-boundary, convergence freeze and the stationarity step guard —
into one ``pallas_call`` whose working set (H ~240x240, Ghat ~220x240 for
the N=10 centroidal problem) lives in VMEM for the whole solve. The only
HBM traffic is the condensed QP in and the primal/dual point out.

Together with ``ops/pallas_riccati.py`` (the fused equality-Riccati solve)
this gives the framework single-kernel solvers for both of its deployment
paths, the TPU speed-of-light analogue of what BLASFEO+HPIPM give the
reference on CPU (SURVEY.md L0+L1).

Algorithm identical to :func:`cheeta_mpc_tpu.ops.condensed.solve_ocp_qp_condensed`
(same init rule, same predictor-corrector, same freeze/guard semantics) so
the two engines are interchangeable and testable against each other.

Design notes:
- Single grid point; ``jax.lax.fori_loop`` over IPM iterations.
- Factorization = Gauss-Jordan inverse with Jacobi pre-equilibration:
  ``Hb^-1 = D (D Hb D)^-1 D`` with ``D = diag(1/sqrt(diag Hb))`` — the
  equilibration bounds the f32 roundoff under barrier conditioning exactly
  like the XLA engine's equilibrated Cholesky. Newton solves add one
  iterative-refinement step (two matvecs) on top of the explicit inverse.
- All vectors are (1, n) row matrices (TPU wants >= 2D); matvecs are
  row-vector GEMMs. ``Ghat`` and its transpose are both passed in so the
  kernel never transposes a matrix.
- Scalars (mu, sigma, step sizes) are rank-0 values produced by masked
  reductions; the loop carries them as (1, 1) arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _gj_invert_ref(L_ref, R_ref, n):
    """In-place Gauss-Jordan inverse on a split augmented pair: ``L_ref``
    holds the SPD matrix, ``R_ref`` the identity on entry; on exit ``R_ref``
    holds the inverse (``L_ref`` becomes the identity).

    Per pivot step: one dynamic-sliced row read per half, a masked 1-row
    reduce for the pivot, one MXU matvec for the pivot column (which always
    lives in the LEFT half — the reason for the split layout, besides lane
    alignment), one rank-1 broadcast update per half, and dynamic row
    writes — ~3 full-matrix passes per step, vs ~10 for the mask-select
    formulation in ops/pallas_riccati._gj_inverse (which stays optimal at
    the tiny nc/nu sizes it is used for). No pivot search: the matrix is
    SPD with explicit regularization and Jacobi pre-equilibration, so the
    diagonal pivots stay positive.
    """
    dt = L_ref.dtype
    cols_row = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    cols_col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def body(j, carry):
        rowL = L_ref[pl.ds(j, 1), :]  # (1, n)
        rowR = R_ref[pl.ds(j, 1), :]
        inv_p = 1.0 / jnp.sum(jnp.where(cols_row == j, rowL, 0.0))
        rnL = rowL * inv_p
        rnR = rowR * inv_p
        e = (cols_col == j).astype(dt)  # (n, 1)
        col = jnp.dot(L_ref[:], e, preferred_element_type=dt)  # (n, 1)
        # Rank-1 elimination; zeroes row j itself (col[j] = pivot), which the
        # dynamic row writes below then set to the normalized pivot row.
        L_ref[:] = L_ref[:] - col * rnL
        R_ref[:] = R_ref[:] - col * rnR
        L_ref[pl.ds(j, 1), :] = rnL
        R_ref[pl.ds(j, 1), :] = rnR
        return carry

    jax.lax.fori_loop(0, n, body, 0)


def _dense_ipm_kernel(H_ref, g0_ref, G_ref, Gt_ref, ghat_ref, lg_ref, ug_ref,
                      m_ref,
                      z_ref, sl_ref, su_ref, ll_ref, lu_ref, mu_ref, stat_ref,
                      gl_ref, gr_ref,
                      *, iters, tau, mu0, s0_min, reg, w_max, mu_tol):
    dt = jnp.float32
    H = H_ref[:]            # (M, M)
    G = G_ref[:]            # (R, M)
    Gt = Gt_ref[:]          # (M, R)
    g0 = g0_ref[:]          # (1, M)
    ghat = ghat_ref[:]      # (1, R)
    lg = lg_ref[:]          # (1, R)
    ug = ug_ref[:]          # (1, R)
    m = m_ref[:]            # (1, R)
    M = H.shape[0]

    eyeM = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)).astype(dt)
    n_active = jnp.maximum(jnp.sum(m), 1.0)
    inf = jnp.asarray(jnp.inf, dt)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=dt)

    def max_step(v, dv):
        ratio = jnp.where((dv < 0) & (m > 0),
                          -tau * v / jnp.minimum(dv, -1e-30), inf)
        return jnp.minimum(1.0, jnp.min(ratio))

    def stat_norm(z, lam_net):
        return jnp.max(jnp.abs(mm(z, H) + g0 + mm(lam_net, G)))

    # --- initialization (same rule as the XLA engine) ------------------------
    g_init = ghat  # z = 0
    s_l0 = jnp.where(m > 0, jnp.maximum(g_init - lg, s0_min), 1.0)
    s_u0 = jnp.where(m > 0, jnp.maximum(ug - g_init, s0_min), 1.0)
    l_l0 = jnp.where(m > 0, mu0 / s_l0, 0.0)
    l_u0 = jnp.where(m > 0, mu0 / s_u0, 0.0)
    z0 = jnp.zeros_like(g0)
    stat0 = stat_norm(z0, m * (l_u0 - l_l0))[None, None]

    def iteration(_, carry):
        z, s_l, s_u, lam_l, lam_u, stat_old_arr, _ = carry
        stat_old = stat_old_arr[0, 0]
        g = mm(z, Gt) + ghat
        r_l = g - s_l - lg
        r_u = g + s_u - ug
        mu = (jnp.sum(m * (s_l * lam_l + s_u * lam_u)) / (2.0 * n_active))

        # Barrier Hessian + equilibrated Gauss-Jordan inverse (factor once).
        w = m * jnp.minimum(lam_l / s_l + lam_u / s_u, w_max)
        Hb = H + mm(Gt * w, G) + reg * eyeM
        diag_col = jnp.sum(Hb * eyeM, axis=1, keepdims=True)     # (M, 1)
        diag_row = jnp.sum(Hb * eyeM, axis=0, keepdims=True)     # (1, M)
        d_col = jax.lax.rsqrt(jnp.maximum(diag_col, 1e-30))
        d_row = jax.lax.rsqrt(jnp.maximum(diag_row, 1e-30))
        douter = d_col * d_row                                   # (M, M)
        gl_ref[:] = Hb * douter
        gr_ref[:] = eyeM
        _gj_invert_ref(gl_ref, gr_ref, M)
        Hinv = douter * gr_ref[:]

        grad = mm(z, H) + g0

        def newton(r_cl, r_cu):
            w_l = lam_l / s_l
            w_u = lam_u / s_u
            beta = m * (w_l * r_l + w_u * r_u + r_cl / s_l - r_cu / s_u)
            lam_net = m * (lam_u - lam_l + beta)
            rhs = -(grad + mm(lam_net, G))
            dz = mm(rhs, Hinv)
            dz = dz + mm(rhs - mm(dz, Hb), Hinv)  # one refinement step
            dg = mm(dz, Gt)
            ds_l = m * (dg + r_l)
            ds_u = m * (-dg - r_u)
            dlam_l = -m * (r_cl + lam_l * ds_l) / s_l
            dlam_u = -m * (r_cu + lam_u * ds_u) / s_u
            return dz, ds_l, ds_u, dlam_l, dlam_u

        # Predictor (affine direction).
        r_cl = m * (s_l * lam_l)
        r_cu = m * (s_u * lam_u)
        dz_a, ds_l_a, ds_u_a, dl_l_a, dl_u_a = newton(r_cl, r_cu)
        a_aff = jnp.minimum(
            jnp.minimum(max_step(s_l, ds_l_a), max_step(s_u, ds_u_a)),
            jnp.minimum(max_step(lam_l, dl_l_a), max_step(lam_u, dl_u_a)))
        mu_aff = (jnp.sum(m * ((s_l + a_aff * ds_l_a) * (lam_l + a_aff * dl_l_a)
                               + (s_u + a_aff * ds_u_a)
                               * (lam_u + a_aff * dl_u_a)))
                  / (2.0 * n_active))
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        # Corrector (reuses the inverse).
        r_cl_c = r_cl + m * (ds_l_a * dl_l_a - sigma * mu)
        r_cu_c = r_cu + m * (ds_u_a * dl_u_a - sigma * mu)
        dz, ds_l, ds_u, dl_l, dl_u = newton(r_cl_c, r_cu_c)
        a = jnp.minimum(
            jnp.minimum(max_step(s_l, ds_l), max_step(s_u, ds_u)),
            jnp.minimum(max_step(lam_l, dl_l), max_step(lam_u, dl_u)))
        # Convergence freeze (fixed-iteration analogue of HPIPM's tol_comp
        # exit; identical to the XLA engine).
        a = a * ((mu > mu_tol) | (stat_old > 1e3 * mu_tol)).astype(dt)

        z_n = z + a * dz
        s_l_n = jnp.where(m > 0, s_l + a * ds_l, 1.0)
        s_u_n = jnp.where(m > 0, s_u + a * ds_u, 1.0)
        l_l_n = jnp.where(m > 0, lam_l + a * dl_l, 0.0)
        l_u_n = jnp.where(m > 0, lam_u + a * dl_u, 0.0)

        # Stationarity step guard: reject steps that grow the KKT
        # stationarity by >10x (NaN compares false => NaN steps rejected).
        stat_new = stat_norm(z_n, m * (l_u_n - l_l_n))
        ok = stat_new <= 10.0 * (stat_old + mu)
        z_n = jnp.where(ok, z_n, z)
        s_l_n = jnp.where(ok, s_l_n, s_l)
        s_u_n = jnp.where(ok, s_u_n, s_u)
        l_l_n = jnp.where(ok, l_l_n, lam_l)
        l_u_n = jnp.where(ok, l_u_n, lam_u)
        stat_carry = jnp.where(ok, stat_new, stat_old)[None, None]
        return (z_n, s_l_n, s_u_n, l_l_n, l_u_n, stat_carry,
                mu[None, None])

    init = (z0, s_l0, s_u0, l_l0, l_u0, stat0, jnp.full((1, 1), inf))
    z, s_l, s_u, lam_l, lam_u, stat, mu = jax.lax.fori_loop(
        0, iters, iteration, init)

    z_ref[:] = z
    sl_ref[:] = s_l
    su_ref[:] = s_u
    ll_ref[:] = lam_l
    lu_ref[:] = lam_u
    mu_ref[:] = mu
    stat_ref[:] = stat


@functools.partial(jax.jit, static_argnames=(
    "iters", "tau", "mu0", "s0_min", "reg", "w_max", "mu_tol", "interpret"))
def pallas_dense_ipm(H, g0, Ghat, ghat, lg, ug, mask, *,
                     iters: int, tau: float, mu0: float, s0_min: float,
                     reg: float, w_max: float, mu_tol: float,
                     interpret: bool = False):
    """Run the fused dense Mehrotra IPM kernel on a condensed QP.

    Returns ``(z, s_l, s_u, lam_l, lam_u, mu, stat)`` in f32 — the same
    quantities the XLA engine's iteration scan produces. Callers expand the
    primal back to the OCP trajectory outside the kernel.
    """
    dt = jnp.float32
    M = H.shape[0]
    R = Ghat.shape[0]
    kern = functools.partial(
        _dense_ipm_kernel, iters=int(iters), tau=float(tau), mu0=float(mu0),
        s0_min=float(s0_min), reg=float(reg), w_max=float(w_max),
        mu_tol=float(mu_tol))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((1, M), dt),   # z
        jax.ShapeDtypeStruct((1, R), dt),   # s_l
        jax.ShapeDtypeStruct((1, R), dt),   # s_u
        jax.ShapeDtypeStruct((1, R), dt),   # lam_l
        jax.ShapeDtypeStruct((1, R), dt),   # lam_u
        jax.ShapeDtypeStruct((1, 1), dt),   # mu
        jax.ShapeDtypeStruct((1, 1), dt),   # stat
    )
    args = (jnp.asarray(H, dt), jnp.asarray(g0, dt)[None],
            jnp.asarray(Ghat, dt), jnp.asarray(Ghat, dt).T,
            jnp.asarray(ghat, dt)[None], jnp.asarray(lg, dt)[None],
            jnp.asarray(ug, dt)[None], jnp.asarray(mask, dt)[None])
    z, s_l, s_u, lam_l, lam_u, mu, stat = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[vspec] * len(args),
        out_specs=tuple([vspec] * len(out_shape)),
        scratch_shapes=[pltpu.VMEM((M, M), dt), pltpu.VMEM((M, M), dt)],
        interpret=interpret,
    )(*args)
    return (z[0], s_l[0], s_u[0], lam_l[0], lam_u[0], mu[0, 0], stat[0, 0])
