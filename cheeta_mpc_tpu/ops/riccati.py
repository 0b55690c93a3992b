"""Riccati recursion kernels for OCP-structured QPs.

The TPU-native replacement for HPIPM's Riccati-based OCP-QP factorization
(reference: ``d_ocp_qp_ipm_solve`` with ``ric_alg 0`` called from
``ocs2_sqp/hpipm_catkin/src/HpipmInterface.cpp:281-301``; BLASFEO supplies the
hand-tuned small-matrix kernels). Here each recursion is a ``jax.lax.scan``
over stages with dense block algebra, designed to be ``vmap``-ed over large
scenario batches — the batch axis, not the stage loop, is what fills the MXU.

The factorization (matrix) pass and the vector pass are split so an
interior-point method can factor once per iteration and run two vector solves
(Mehrotra predictor + corrector) against the same factors.

Convention (k = 0..N-1, terminal N):
    min  sum_k 1/2 [dx;du]' [Q S'; S R] [dx;du] + [q;r]'[dx;du]  + terminal
    s.t. dx_{k+1} = A dx_k + B du_k + b_k,   dx_0 given.

Backward recursion:
    P_N = Q_N,  p_N = q_N
    G_k = R_k + B' P_{k+1} B          (factor: L_G = chol(G))
    H_k = S_k + B' P_{k+1} A
    K_k = -G^{-1} H_k
    P_k = Q_k + A' P_{k+1} A - K' G K
    m_k = p_{k+1} + P_{k+1} b_k
    k_k = -G^{-1} (r_k + B' m_k)
    p_k = q_k + A' m_k + K_k' (r_k + B' m_k)

Forward:
    du_k = K_k dx_k + k_k,   dx_{k+1} = A dx_k + B du_k + b_k.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve

from cheeta_mpc_tpu.core.types import (CostApprox, DynamicsLin, OcpQpData,
                                       OcpQpSolution, RiccatiGains, symmetrize)


class RiccatiFactors(NamedTuple):
    """Per-stage factorization products needed for vector solves."""

    K: jnp.ndarray  # (N, nu, nx) feedback gains
    L_G: jnp.ndarray  # (N, nu, nu) Cholesky factors of G_k (lower)
    P: jnp.ndarray  # (N+1, nx, nx) value-function Hessians


def riccati_factorize(dyn: DynamicsLin, Q: jnp.ndarray, R: jnp.ndarray,
                      S: jnp.ndarray, reg: float = 0.0) -> RiccatiFactors:
    """Backward matrix pass. Q: (N+1,nx,nx), R: (N,nu,nu), S: (N,nu,nx)."""
    nu = R.shape[-1]
    eye_u = jnp.eye(nu, dtype=R.dtype)

    def body(P_next, stage):
        A, B, Qk, Rk, Sk = stage
        PB = P_next @ B  # (nx, nu)
        G = Rk + B.T @ PB + reg * eye_u
        H = Sk + PB.T @ A  # (nu, nx)  == S + B'P A
        L_G = jnp.linalg.cholesky(symmetrize(G))
        K = -cho_solve((L_G, True), H)
        P = Qk + A.T @ (P_next @ A) + H.T @ K
        P = symmetrize(P)
        return P, (K, L_G, P)

    _, (K, L_G, P_stages) = jax.lax.scan(
        body, symmetrize(Q[-1]), (dyn.A, dyn.B, Q[:-1], R, S), reverse=True)
    P = jnp.concatenate([P_stages, symmetrize(Q[-1])[None]], axis=0)
    return RiccatiFactors(K=K, L_G=L_G, P=P)


def riccati_vector(dyn: DynamicsLin, q: jnp.ndarray, r: jnp.ndarray,
                   factors: RiccatiFactors):
    """Backward vector pass against stored factors.

    q: (N+1, nx), r: (N, nu). Returns (k: (N,nu), p: (N+1,nx)).
    """

    def body(p_next, stage):
        A, B, b, qk, rk, K, L_G, P_next = stage
        m = p_next + P_next @ b  # (nx,)
        rhs = rk + B.T @ m  # (nu,)
        k = -cho_solve((L_G, True), rhs)
        p = qk + A.T @ m + K.T @ rhs
        return p, (k, p)

    _, (k, p_stages) = jax.lax.scan(
        body, q[-1],
        (dyn.A, dyn.B, dyn.b, q[:-1], r, factors.K, factors.L_G,
         factors.P[1:]),
        reverse=True)
    p = jnp.concatenate([p_stages, q[-1][None]], axis=0)
    return k, p


def lqr_forward(dyn: DynamicsLin, K: jnp.ndarray, k: jnp.ndarray,
                dx0: jnp.ndarray):
    """Forward rollout of the affine policy. Returns (dx: (N+1,nx), du: (N,nu))."""

    def body(dx, stage):
        A, B, b, Kk, kk = stage
        du = Kk @ dx + kk
        dx_next = A @ dx + B @ du + b
        return dx_next, (dx, du)

    dxN, (dx, du) = jax.lax.scan(body, dx0, (dyn.A, dyn.B, dyn.b, K, k))
    dx = jnp.concatenate([dx, dxN[None]], axis=0)
    return dx, du


def solve_lqr(data: OcpQpData, reg: float = 0.0) -> OcpQpSolution:
    """Solve an equality-constrained (unconstrained-inequality) OCP-QP exactly.

    The oracle path for tests and the inner engine of the IPM.
    """
    cost = data.cost
    factors = riccati_factorize(data.dyn, cost.Q, cost.R, cost.S, reg=reg)
    k, p = riccati_vector(data.dyn, cost.q, cost.r, factors)
    dx, du = lqr_forward(data.dyn, factors.K, k, dx0=data.dx0)
    gains = RiccatiGains(K=factors.K, k=k, P=factors.P, p=p)
    N1 = cost.Q.shape[0]
    ng = 0 if data.con is None else data.con.ng
    zshape = (N1, ng)
    zero = jnp.zeros((), dx.dtype)
    return OcpQpSolution(
        dx=dx, du=du, gains=gains,
        lam_l=jnp.zeros(zshape, dx.dtype), lam_u=jnp.zeros(zshape, dx.dtype),
        s_l=jnp.ones(zshape, dx.dtype), s_u=jnp.ones(zshape, dx.dtype),
        iterations=jnp.zeros((), jnp.int32), mu=zero, stat_res=zero,
        ineq_res=zero, eq_res=zero)


def cost_of(cost: CostApprox, dx: jnp.ndarray, du: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the quadratic objective at (dx, du)."""
    dxs, dxN = dx[:-1], dx[-1]
    stage = (0.5 * jnp.einsum('ki,kij,kj->', dxs, cost.Q[:-1], dxs)
             + 0.5 * jnp.einsum('ki,kij,kj->', du, cost.R, du)
             + jnp.einsum('ki,kij,kj->', du, cost.S, dxs)
             + jnp.einsum('ki,ki->', cost.q[:-1], dxs)
             + jnp.einsum('ki,ki->', cost.r, du))
    term = 0.5 * dxN @ cost.Q[-1] @ dxN + cost.q[-1] @ dxN
    return stage + term
