"""Fused equality-Riccati solver as a single Pallas TPU kernel.

The batch-1 latency of the stage-serial Riccati solve is dominated by the
*sequential chain of small ops*: each XLA op on a 24x24 block pays an HBM
round-trip, and a full backward+forward pass issues hundreds of them
(PERF.md "Sequential-latency analysis"). This kernel fuses the ENTIRE
equality-constrained LQR solve — backward matrix factorization, backward
vector pass and forward rollout (the math of
:func:`cheeta_mpc_tpu.ops.riccati.riccati_factorize_eq` /
``riccati_vector_eq`` / ``lqr_forward``, i.e. ``solve_eq_lqr``) — into one
``pallas_call`` whose working set lives entirely in VMEM: the only HBM
traffic is the problem data in and the solution out.

This is the TPU speed-of-light analogue of what BLASFEO gives HPIPM on CPU
(reference L0, SURVEY.md §1): hand-scheduled small-matrix kernels with the
factors kept close to the compute units across the recursion.

Design notes:
- Single grid point; ``jax.lax.fori_loop`` over stages inside the kernel.
- The two SPD inverses per stage (G nu x nu, Lam nc x nc) are Gauss-Jordan
  eliminations with mask-selected pivots (no dynamic row indexing — TPU
  vector lanes want masked VPU ops). No pivot search: both matrices are SPD
  with explicit regularization, so the diagonal pivots stay positive.
- All vectors are (1, n) row matrices (TPU wants >= 2D); matvecs are
  row-vector GEMMs (``row @ M``).
- f32; used for deployment solves. Oracle tests compare against the scan
  implementation (tests/test_pallas_riccati.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cheeta_mpc_tpu.core.types import OcpQpData, OcpQpSolution, RiccatiGains


def _gj_inverse(M):
    """Gauss-Jordan inverse of an SPD (n, n) matrix, Python-unrolled with
    static length-1 slices.

    Numerically identical to the earlier masked-iota formulation (same
    elimination arithmetic), but each pivot step is 4 vector ops instead of
    ~10 (no iota-mask selections, no reductions, no dynamic loop) — the
    per-stage SPD inverses are the longest sequential chains in the fused
    kernels, so this shortens batch-1 latency directly.

    The separate add-the-pivot-row-back step is deliberate here (vs the
    fused one-hot-shifted column of :func:`_gj_inverse_shifted`): with
    UNscaled pivots, ``pivot - 1`` absorbs the 1 once |pivot| >> 1 and
    row j degrades — measured 3x worse on the near-singular synthetic
    N=67 oracle. Equilibrated callers have O(1) pivots and take the
    shifted variant."""
    n = M.shape[0]
    dt = M.dtype
    eye = jnp.eye(n, dtype=dt)
    A = jnp.concatenate([M, eye], axis=1)  # (n, 2n)
    for j in range(n):
        pivot = A[j:j + 1, j:j + 1]  # (1, 1)
        row_j = A[j:j + 1] / pivot  # (1, 2n)
        col_j = A[:, j:j + 1]  # (n, 1)
        # Eliminate column j from every row; the update zeroes row j itself
        # (col_j[j] = pivot), so add the scaled pivot row back.
        A = A - col_j * row_j
        A = A + eye[:, j:j + 1] * row_j
    return A[:, n:]


def _gj_inverse_shifted(M):
    """Gauss-Jordan with the one-hot-shifted pivot column: 3 wide vector
    ops per pivot instead of 5 (divide, multiply, subtract; the add-back
    is folded into the elimination FMA by subtracting e_j from the pivot
    column first, which lands row j on the normalized pivot row). Only
    safe on EQUILIBRATED matrices (pivots O(1)) — see _gj_inverse."""
    n = M.shape[0]
    dt = M.dtype
    eye = jnp.eye(n, dtype=dt)
    A = jnp.concatenate([M, eye], axis=1)  # (n, 2n)
    for j in range(n):
        pivot = A[j:j + 1, j:j + 1]  # (1, 1)
        row_j = A[j:j + 1] / pivot  # (1, 2n)
        colm = A[:, j:j + 1] - eye[:, j:j + 1]  # (n, 1)
        A = A - colm * row_j
    return A[:, n:]


def spd_inverse_kernel(M, n, precision=None):
    """Equilibrated Gauss-Jordan inverse, in-kernel.

    Plain GJ loses accuracy once the SPD matrix is ill-conditioned (the
    Riccati G absorbs B'PB with P growing over long horizons; the IPM's
    barrier-augmented G reaches condition ~1/mu). Jacobi pre-equilibration
    ``M^-1 = D (D M D)^-1 D`` with ``D = diag(1/sqrt(diag M))`` restores
    scan-path (recursive-Schur) agreement; measured on the N=67 legged
    solve the unequilibrated version was off by ~3% in forces (bench.py
    eq-kernel oracle), and 3x worse on the random nc=16 oracle.

    Deliberately NO Newton refinement ``X <- X (2I - M X)``: at condition
    ~1e7 the f32 residual ``2I - MX`` suffers catastrophic cancellation and
    the "refined" inverse is measurably WORSE (0.043 vs 0.009 max error on
    the nc=16 oracle). ``precision`` is accepted for parity with callers
    but unused — the inverse itself is division/VPU work."""
    del precision
    dt = M.dtype
    eye = jnp.eye(n, dtype=dt)
    d = jnp.sum(M * eye, axis=1, keepdims=True)  # (n, 1) diagonal
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    # Equilibrated pivots are O(1), so the 3-op shifted-column GJ is safe.
    X = _gj_inverse_shifted(s * M * s.T)
    return s * X * s.T  # undo equilibration


def _eq_lqr_kernel(A_ref, B_ref, b_ref, Q_ref, q_ref, R_ref, r_ref, S_ref,
                   C_ref, D_ref, e_ref, m_ref, dx0_ref,
                   dx_ref, du_ref, K_ref, k_ref, P_ref, p_ref,
                   *, N, nx, nu, nc, reg, eps):
    dt = jnp.float32
    eye_u = jnp.eye(nu, dtype=dt)
    eye_c = jnp.eye(nc, dtype=dt)

    # ---- terminal boundary -------------------------------------------------
    # Symmetrize the terminal cost like the scan path (solve_eq_lqr uses
    # symmetrize(Q[-1])) so an asymmetric Q_N cannot cause backend-dependent
    # divergence between 'scan' and 'pallas' solutions.
    Q_N = Q_ref[N]
    P_ref[N] = 0.5 * (Q_N + Q_N.T)
    p_ref[pl.ds(N, 1)] = q_ref[pl.ds(N, 1)]

    # ---- backward pass: factorize + vector, one fused loop -----------------
    def backward(i, carry):
        k = N - 1 - i
        P_next = P_ref[k + 1]  # (nx, nx)
        p_next = p_ref[pl.ds(k + 1, 1)]  # (1, nx)
        A = A_ref[k]
        B = B_ref[k]
        Ck = C_ref[k]  # (nc, nx)
        Dk = D_ref[k]  # (nc, nu)
        mk = m_ref[pl.ds(k, 1)]  # (1, nc)

        def mm(a, b):
            # precision=HIGHEST: Mosaic's f32 dot defaults to a single bf16
            # MXU pass; over a 67-stage recursion the truncation compounds
            # to O(10 N) force errors (bench.py eq-kernel oracle). The
            # multi-pass f32 algorithm restores scan-path agreement at
            # negligible cost (these matmuls are latency-bound).
            return jnp.dot(a, b, preferred_element_type=dt,
                           precision=jax.lax.Precision.HIGHEST)

        PA = mm(P_next, A)  # (nx, nx)
        PB = mm(P_next, B)  # (nx, nu)
        G = R_ref[k] + mm(B.T, PB) + reg * eye_u
        H = S_ref[k] + mm(B.T, PA)  # (nu, nx)
        # Plain GJ here (not the equilibrated variant): on the real legged
        # problem both agree with the scan path to ~3e-4 (the 8.8 N TPU
        # mismatch was bf16 matmul precision, fixed via mm()'s HIGHEST),
        # and on the near-singular synthetic N=67 oracle plain GJ is the
        # more robust of the two. The IPM kernel uses the equilibrated
        # variant because its barrier-conditioned G genuinely needs it.
        Ginv = _gj_inverse(0.5 * (G + G.T))
        Y = mm(Ginv, Dk.T)  # (nu, nc)
        Lam = mm(Dk, Y) + eye_c * (eps * (1.0 - mk))  # row broadcast -> diag
        Li = _gj_inverse(0.5 * (Lam + Lam.T))
        YLi = mm(Y, Li)  # (nu, nc)
        W = Ginv - mm(YLi, Y.T)
        Kk = -(mm(W, H) + mm(YLi, Ck))  # (nu, nx)
        CYH = Ck - mm(Y.T, H)  # (nc, nx)
        Pk = Q_ref[k] + mm(A.T, PA) + mm(H.T, Kk) + mm(Ck.T, mm(Li, CYH))
        Pk = 0.5 * (Pk + Pk.T)

        # Vector pass (h = -(mask * e), matching solve_eq_lqr).
        h_row = -(mk * e_ref[pl.ds(k, 1)])  # (1, nc)
        b_row = b_ref[pl.ds(k, 1)]  # (1, nx)
        mvec = p_next + mm(b_row, P_next.T)  # (1, nx)
        g = r_ref[pl.ds(k, 1)] + mm(mvec, B)  # (1, nu)
        kvec = -(mm(g, W.T) - mm(h_row, YLi.T))  # (1, nu)
        nu0 = -(mm(h_row, Li.T) + mm(g, YLi))  # (1, nc)
        pk = (q_ref[pl.ds(k, 1)] + mm(mvec, A) + mm(kvec, H)
              + mm(nu0, Ck))  # (1, nx)

        P_ref[k] = Pk
        p_ref[pl.ds(k, 1)] = pk
        K_ref[k] = Kk
        k_ref[pl.ds(k, 1)] = kvec
        return carry

    jax.lax.fori_loop(0, N, backward, 0)

    # ---- forward rollout ----------------------------------------------------
    dx_ref[pl.ds(0, 1)] = dx0_ref[pl.ds(0, 1)]

    def forward(k, carry):
        dx = dx_ref[pl.ds(k, 1)]  # (1, nx)
        hi = jax.lax.Precision.HIGHEST  # see mm() in the backward pass
        du = (jnp.dot(dx, K_ref[k].T, preferred_element_type=jnp.float32,
                      precision=hi)
              + k_ref[pl.ds(k, 1)])  # (1, nu)
        du_ref[pl.ds(k, 1)] = du
        dx_ref[pl.ds(k + 1, 1)] = (
            jnp.dot(dx, A_ref[k].T, preferred_element_type=jnp.float32,
                    precision=hi)
            + jnp.dot(du, B_ref[k].T, preferred_element_type=jnp.float32,
                      precision=hi)
            + b_ref[pl.ds(k, 1)])
        return carry

    jax.lax.fori_loop(0, N, forward, 0)


@functools.partial(jax.jit, static_argnames=("reg", "eps", "interpret"))
def pallas_solve_eq_lqr(data: OcpQpData, reg: float = 1e-9,
                        eps: float = 1.0,
                        interpret: bool = False) -> OcpQpSolution:
    """Drop-in fused-kernel replacement for
    :func:`cheeta_mpc_tpu.ops.riccati.solve_eq_lqr` (equality-constrained
    LQR, no inequalities). f32 on hardware; ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU CI)."""
    dyn, cost, eq = data.dyn, data.cost, data.eq
    N, nx, nu = dyn.horizon, dyn.nx, dyn.nu
    nc = eq.C.shape[-2]
    dt = jnp.float32

    kern = functools.partial(_eq_lqr_kernel, N=N, nx=nx, nu=nu, nc=nc,
                             reg=float(reg), eps=float(eps))
    out_shape = (
        jax.ShapeDtypeStruct((N + 1, nx), dt),  # dx
        jax.ShapeDtypeStruct((N, nu), dt),  # du
        jax.ShapeDtypeStruct((N, nu, nx), dt),  # K
        jax.ShapeDtypeStruct((N, nu), dt),  # k
        jax.ShapeDtypeStruct((N + 1, nx, nx), dt),  # P
        jax.ShapeDtypeStruct((N + 1, nx), dt),  # p
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    args = (dyn.A, dyn.B, dyn.b, cost.Q, cost.q, cost.R, cost.r, cost.S,
            eq.C, eq.D, eq.e, eq.mask, data.dx0[None])
    args = tuple(jnp.asarray(a, dt) for a in args)
    dx, du, K, kvec, P, p = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[vspec] * len(args),
        out_specs=tuple([vspec] * len(out_shape)),
        interpret=interpret,
    )(*args)

    gains = RiccatiGains(K=K, k=kvec, P=P, p=p)
    ng = 0 if data.con is None else data.con.ng
    zshape = (N + 1, ng)
    zero = np.zeros((), np.float32)
    return OcpQpSolution(
        dx=dx, du=du, gains=gains,
        lam_l=np.zeros(zshape, np.float32),
        lam_u=np.zeros(zshape, np.float32),
        s_l=np.ones(zshape, np.float32), s_u=np.ones(zshape, np.float32),
        iterations=np.zeros((), np.int32), mu=zero, stat_res=zero,
        ineq_res=zero, eq_res=zero)
