"""State-input equality-constraint projection (null-space elimination).

Re-creates the capability of the reference's ``ConstraintProjection``
(``ocs2_sqp/ocs2_sqp/src/ConstraintProjection.cpp:34-65``) and the
change-of-input-variables transcription step
(``MultipleShootingTranscription.cpp:67-82``): given stage equalities
``C dx + D du + e = 0`` with full-row-rank ``D``, substitute
``du = Pu @ du_tilde + Px @ dx + Pe`` so the reduced problem in ``du_tilde``
is unconstrained.

QR variant (reference :34-53):   D' = [Q1 Q2] [R1; 0]
    Pu = Q2,  Px = -Q1 R1^{-T} C,  Pe = -Q1 R1^{-T} e
LU variant (reference :55-65):   pseudo-inverse based
    Pu = ker(D),  Px = -D^+ C,  Pe = -D^+ e

On TPU the QR variant is preferred (jnp.linalg.qr is batched and stable);
both are provided for parity. Rank is a *static* argument — for the legged
problem the active equality set is known from the contact flags, so
projections are specialized per contact mode (see SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


class Projection(NamedTuple):
    Pu: jnp.ndarray  # (nu, nu - nc) null-space basis
    Px: jnp.ndarray  # (nu, nx) particular-solution state map
    Pe: jnp.ndarray  # (nu,) particular-solution offset


def qr_projection(C: jnp.ndarray, D: jnp.ndarray, e: jnp.ndarray) -> Projection:
    """QR-based projection. D: (nc, nu) with nc <= nu, full row rank."""
    nc = D.shape[0]
    Qfull, Rfull = jnp.linalg.qr(D.T, mode='complete')  # (nu,nu), (nu,nc)
    Q1 = Qfull[:, :nc]
    Q2 = Qfull[:, nc:]
    R1 = Rfull[:nc, :]
    # Q1 R1^{-T} applied to C and e:  solve R1' Y = C  =>  Y = R1^{-T} C.
    Yc = solve_triangular(R1.T, C, lower=True)
    Ye = solve_triangular(R1.T, e, lower=True)
    return Projection(Pu=Q2, Px=-Q1 @ Yc, Pe=-Q1 @ Ye)


def lu_projection(C: jnp.ndarray, D: jnp.ndarray, e: jnp.ndarray) -> Projection:
    """Pseudo-inverse-based projection (reference LU variant, :55-65).

    For full-row-rank D the pseudo-inverse is D' (D D')^{-1}, computed via
    Cholesky (no SVD: orders of magnitude cheaper to compile/run on TPU and
    exact to machine precision)."""
    nc, nu = D.shape
    G = D @ D.T
    L = jnp.linalg.cholesky(G)
    from jax.scipy.linalg import cho_solve
    Dpinv = cho_solve((L, True), D).T  # (nu, nc)
    Qfull, _ = jnp.linalg.qr(D.T, mode='complete')
    Pu = Qfull[:, nc:]
    return Projection(Pu=Pu, Px=-Dpinv @ C, Pe=-Dpinv @ e)


def change_of_input_variables(H_uu, H_ux, h_u, proj: Projection):
    """Map input-space quadratic data through du = Pu du~ + Px dx + Pe.

    Returns the reduced (H_uu~, H_ux~, h_u~) in du~ coordinates plus the
    cross/constant corrections to the state blocks:
        dH_xx = Px' H_uu Px + Px' H_ux + H_ux' Px
        dh_x  = Px'(H_uu Pe + h_u) + H_ux' Pe
    (reference: ocs2_core changeOfInputVariables used at
    MultipleShootingTranscription.cpp:72-80).
    """
    Pu, Px, Pe = proj
    HuuPu = H_uu @ Pu
    HuuPx = H_uu @ Px
    HuuPe = H_uu @ Pe
    H_uu_t = Pu.T @ HuuPu
    H_ux_t = Pu.T @ (HuuPx + H_ux)
    h_u_t = Pu.T @ (HuuPe + h_u)
    dH_xx = Px.T @ HuuPx + Px.T @ H_ux + H_ux.T @ Px
    dh_x = Px.T @ (HuuPe + h_u) + H_ux.T @ Pe
    return H_uu_t, H_ux_t, h_u_t, dH_xx, dh_x
