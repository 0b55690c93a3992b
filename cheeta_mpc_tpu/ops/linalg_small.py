"""Small-matrix linear algebra, unrolled for TPU.

XLA-TPU lowers ``jnp.linalg.cholesky`` / ``cho_solve`` on small matrices to
serial column loops with dynamic slicing — ~25x slower than the surrounding
batched matmuls in the Riccati recursion (measured: 71 ms of a 100 ms IPM
iteration at batch 2048). These replacements unroll the factorizations at
trace time into static elementwise/outer-product steps, which XLA fuses into
a handful of VPU passes, and produce an *explicit inverse* so every
downstream solve is a plain (MXU-friendly) matmul.

This is the role BLASFEO's hand-tuned small-matrix kernels play in the
reference stack (fetched by ``ocs2_sqp/blasfeo_catkin``); here the "hand
tuning" is trace-time unrolling + the batch axis supplied by ``vmap``.

Accuracy: explicit inversion loses ~cond(G)*eps; one step of iterative
refinement (``spd_inverse(..., refine=1)``) squares that error away, keeping
f32 usable at the barrier conditioning the IPM reaches before its
convergence freeze.
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_unrolled(G: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of an SPD matrix, statically unrolled.

    G: (..., n, n). Right-looking rank-1-update form: n outer products,
    all batched elementwise — no dynamic slicing.
    """
    n = G.shape[-1]
    idx = jnp.arange(n)
    M = G
    cols = []
    for j in range(n):
        d = jnp.sqrt(M[..., j, j])
        col = M[..., :, j] / d[..., None]
        col = jnp.where(idx >= j, col, 0.0)
        cols.append(col)
        M = M - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def tri_lower_inv_unrolled(L: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a lower-triangular matrix, statically unrolled.

    Row-by-row forward substitution: row_i = (e_i - L[i,:i] @ rows) / L[i,i].
    """
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    rows = []
    for i in range(n):
        acc = eye[i]
        for j in range(i):
            acc = acc - L[..., i, j][..., None] * rows[j]
        rows.append(acc / L[..., i, i][..., None])
    return jnp.stack(rows, axis=-2)


def _inv3(G: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of (..., 3, 3) — fully parallel."""
    a, b, c = G[..., 0, 0], G[..., 0, 1], G[..., 0, 2]
    d, e, f = G[..., 1, 0], G[..., 1, 1], G[..., 1, 2]
    g, h, i = G[..., 2, 0], G[..., 2, 1], G[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    row0 = jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1)
    row1 = jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1)
    row2 = jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def _inv_schur(G: jnp.ndarray) -> jnp.ndarray:
    """Recursive SPD inverse via Schur complements.

    Splits into halves down to a 3x3 (or smaller) closed-form base; the
    recursion is ~log2(n/3) levels of batched matmuls with a short
    dependency chain — the TPU-friendly shape (MXU bmms, no serial
    column loops)."""
    n = G.shape[-1]
    if n <= 3:
        if n == 0:
            return G
        if n == 3:
            return _inv3(G)
        if n == 1:
            return 1.0 / G
        # n == 2 closed form
        a, b = G[..., 0, 0], G[..., 0, 1]
        c, d = G[..., 1, 0], G[..., 1, 1]
        det = a * d - b * c
        row0 = jnp.stack([d, -b], axis=-1)
        row1 = jnp.stack([-c, a], axis=-1)
        return jnp.stack([row0, row1], axis=-2) / det[..., None, None]
    # Split as evenly as possible with the first block a multiple of 3.
    m = max(3, (n // 2 + 2) // 3 * 3)
    A = G[..., :m, :m]
    B = G[..., :m, m:]
    C = G[..., m:, m:]
    Ainv = _inv_schur(A)
    AinvB = Ainv @ B
    S = C - jnp.swapaxes(B, -1, -2) @ AinvB  # Schur complement (SPD)
    Sinv = _inv_schur(S)
    TR = -AinvB @ Sinv
    TL = Ainv - TR @ jnp.swapaxes(AinvB, -1, -2)
    BL = jnp.swapaxes(TR, -1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Sinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_inverse(G: jnp.ndarray, refine: int = 1) -> jnp.ndarray:
    """Explicit inverse of an SPD matrix, TPU-native.

    Recursive Schur-complement block inversion (batched matmuls, short
    dependency chain) + ``refine`` steps of Newton iterative refinement
    (X <- X (2I - G X)) to square away the blocked-elimination error.
    """
    X = _inv_schur(G)
    n = G.shape[-1]
    eye2 = 2.0 * jnp.eye(n, dtype=G.dtype)
    for _ in range(refine):
        X = X @ (eye2 - G @ X)
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))
