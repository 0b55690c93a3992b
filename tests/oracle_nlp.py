"""Independent NLP oracle for the centroidal-MPC golden test.

Solves the reference's centroidal NLP (/root/reference/CentroidalMPC.cpp:
41-276) with a *second, unrelated method*: **single shooting** — the states
are eliminated by forward-simulating the Euler dynamics inside the objective,
leaving only the inputs U as decision variables — solved by scipy
``trust-constr`` in f64. No multiple-shooting defects, no deviation
coordinates, no Riccati structure, no IPM: everything here (input unpacking,
dynamics, cost, constraints) is written fresh from the reference semantics so
a match certifies both the framework's transcription and its solver (VERDICT
round 1, "What's missing" #2).

Variables: z = vec(U), U: (N, 24) = [foot_vel(3*nl), F(3*nl)] per step.

Constraint treatment (equivalent to the reference's,
CentroidalMPC.cpp:162-201):
- swing-leg forces zero via variable bounds (the reference uses degenerate
  0 <= A F <= 0 pyramid rows; same feasible set);
- friction pyramid rows on stance legs: linear in U;
- footstep box at nodes 1..N: foot positions are *linear* in the foot
  velocities (p_k = p_0 + dt * sum_{j<k} (1-e_j) v_j), so the box rows are a
  LinearConstraint as well;
- dynamics are exact by construction (single shooting) — no equality
  constraints remain, which is what lets trust-constr converge to
  optimality-tolerance 1e-9 where the dense multiple-shooting transcription
  stalls.

A 1e-6 foot-velocity regularizer (matching CentroidalMpcConfig.reg_eps) pins
the stance-phase foot velocities the reference leaves to IPOPT's internal
regularization; it is three orders of magnitude below the 1e-3 GRF tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import Bounds, LinearConstraint, minimize

GRAVITY = 9.81


def unpack_packed_inputs(N, nl, mass, state, des_state, des_inputs):
    """Fresh decode of the reference's packed vectors
    (CentroidalMPC.cpp:278-335)."""
    state = np.asarray(state, np.float64)
    des_state = np.asarray(des_state, np.float64)
    des_inputs = np.asarray(des_inputs, np.float64)
    x0 = state[:9 + 3 * nl]
    pn = 3 * (N + 1)
    des_com_pos = des_state[0:pn].reshape(N + 1, 3)
    des_com_vel = des_state[pn:2 * pn].reshape(N + 1, 3)
    des_ang_mom = des_state[2 * pn:3 * pn].reshape(N + 1, 3)
    enable = np.zeros((N, nl))
    des_foot_pos = np.zeros((nl, N + 1, 3))
    for i in range(nl):
        off = i * (4 * N + 3)
        enable[:, i] = des_inputs[off:off + N]
        des_foot_pos[i] = des_inputs[off + N:off + N + pn].reshape(N + 1, 3)
    stance = np.maximum(enable.sum(axis=1), 1.0)
    des_force = np.zeros((nl, N, 3))
    des_force[:, :, 2] = enable.T * (mass * GRAVITY / stance)[None, :]
    return (x0, des_com_pos, des_com_vel, des_ang_mom, des_foot_pos,
            des_force, enable)


def solve_oracle_nlp(N, nl, mass, dt, mu, weights, state, des_state,
                     des_inputs, foot_step_lb=(-0.2, -0.2, -0.1),
                     foot_step_ub=(0.2, 0.2, 0.1), force_max=5000.0,
                     reg_eps=1e-6, gtol=1e-10, maxiter=4000):
    """Returns (forces: (nl, 3, N), foot_pos: (nl, 3, N+1), result)."""
    (x0, des_cp, des_cv, des_am, des_fp, des_f,
     enable) = unpack_packed_inputs(N, nl, mass, state, des_state, des_inputs)
    w = np.asarray(weights, np.float64)
    nur = 6 * nl
    nz = N * nur
    enable_j = jnp.asarray(enable)
    x0_j = jnp.asarray(x0)

    def step(x, u, e):
        """Euler step, reference CentroidalMPC.cpp:85-94 (fresh code)."""
        cp, cv, am = x[0:3], x[3:6], x[6:9]
        fp = x[9:].reshape(nl, 3)
        fv = u[:3 * nl].reshape(nl, 3)
        F = u[3 * nl:].reshape(nl, 3)
        eF = e[:, None] * F
        acc = jnp.array([0.0, 0.0, -GRAVITY]) + jnp.sum(eF, axis=0) / mass
        ldot = jnp.sum(jnp.cross(fp - cp, eF), axis=0)
        return jnp.concatenate([
            cp + dt * cv, cv + dt * acc, am + dt * ldot,
            (fp + dt * (1.0 - e)[:, None] * fv).reshape(-1)])

    def rollout(U):
        def body(x, inp):
            u, e = inp
            xn = step(x, u, e)
            return xn, xn

        _, Xs = jax.lax.scan(body, x0_j, (U, enable_j))
        return jnp.concatenate([x0_j[None], Xs], axis=0)

    w_fp = jnp.asarray(w[9:9 + 3 * nl].reshape(nl, 3))
    w_f = jnp.asarray(w[9 + 3 * nl:9 + 6 * nl].reshape(nl, 3))
    w_r = jnp.asarray(w[9 + 6 * nl:9 + 9 * nl].reshape(nl, 3))

    def objective(z):
        U = z.reshape(N, nur)
        X = rollout(U)
        ks = jnp.arange(N + 1, dtype=jnp.float64)
        wz = (w[2] / 2) * jnp.exp(-ks) + w[2] / 2  # CentroidalMPC.cpp:203-206
        dcp = X[:, 0:3] - des_cp
        dcv = X[:, 3:6] - des_cv
        dam = X[:, 6:9] - des_am
        c = jnp.sum(w[0] * dcp[:, 0] ** 2 + w[1] * dcp[:, 1] ** 2
                    + (wz * dcp[:, 2]) ** 2)
        c += jnp.sum(w[3] * dcv[:, 0] ** 2 + w[4] * dcv[:, 1] ** 2
                     + w[5] * dcv[:, 2] ** 2)
        c += jnp.sum(w[6] * dam[:, 0] ** 2 + w[7] * dam[:, 1] ** 2
                     + w[8] * dam[:, 2] ** 2)
        fp = X[:, 9:].reshape(N + 1, nl, 3)
        c += jnp.sum(w_fp[None] * (fp - jnp.asarray(
            des_fp.transpose(1, 0, 2))) ** 2)
        F = U[:, 3 * nl:].reshape(N, nl, 3)
        eF = enable_j[:, :, None] * F
        c += jnp.sum(w_f[None] * (eF - jnp.asarray(
            des_f.transpose(1, 0, 2))) ** 2)
        # Force rate on the *effective* force (diff over stages 1..N-1).
        c += jnp.sum(w_r[None] * (eF[1:] - eF[:-1]) ** 2)
        fv = U[:, :3 * nl]
        c += reg_eps * jnp.sum(fv ** 2)
        return c

    obj_g = jax.jit(jax.value_and_grad(objective))
    obj_h = jax.jit(jax.hessian(objective))

    # Bounds: swing forces zero.
    lb = np.full(nz, -np.inf)
    ub = np.full(nz, np.inf)
    for k in range(N):
        for i in range(nl):
            if enable[k, i] == 0:
                s = k * nur + 3 * nl + 3 * i
                lb[s:s + 3] = ub[s:s + 3] = 0.0

    # Friction pyramid rows for stance legs (CentroidalMPC.cpp:179-200).
    pyr = np.array([[-1, 0, mu], [1, 0, mu], [0, -1, mu], [0, 1, mu],
                    [0, 0, 1]], np.float64)
    row_ub = np.array([force_max] * 4 + [mass * GRAVITY * nl])
    A_rows, rub = [], []
    for k in range(N):
        for i in range(nl):
            if enable[k, i] == 1:
                blk = np.zeros((5, nz))
                blk[:, k * nur + 3 * nl + 3 * i:
                    k * nur + 3 * nl + 3 * i + 3] = pyr
                A_rows.append(blk)
                rub.extend(row_ub.tolist())
    # Footstep box rows: p_{i,k} = p0_i + dt * sum_{j<k} (1-e_{j,i}) v_{j,i}
    # is linear in the foot velocities.
    B_rows, blo, bup = [], [], []
    for k in range(1, N + 1):
        for i in range(nl):
            blk = np.zeros((3, nz))
            for j in range(k):
                if enable[j, i] == 0:
                    blk[:, j * nur + 3 * i:j * nur + 3 * i + 3] = dt * np.eye(3)
            B_rows.append(blk)
            blo.extend((des_fp[i, k] + np.asarray(foot_step_lb)
                        - x0[9 + 3 * i:12 + 3 * i]).tolist())
            bup.extend((des_fp[i, k] + np.asarray(foot_step_ub)
                        - x0[9 + 3 * i:12 + 3 * i]).tolist())
    A_lin = np.concatenate(A_rows + B_rows, axis=0)
    lin_lb = np.concatenate([np.zeros(len(rub)), np.asarray(blo)])
    lin_ub = np.concatenate([np.asarray(rub), np.asarray(bup)])

    # Initial guess: desired forces, zero foot velocities.
    U0 = np.zeros((N, nur))
    U0[:, 3 * nl:] = des_f.transpose(1, 0, 2).reshape(N, 3 * nl)
    z0 = np.clip(U0.reshape(-1), lb, ub)

    res = minimize(
        lambda z: tuple(np.asarray(v) for v in obj_g(jnp.asarray(z))),
        z0, jac=True,
        hess=lambda z: np.asarray(obj_h(jnp.asarray(z))),
        method="trust-constr",
        constraints=[LinearConstraint(A_lin, lin_lb, lin_ub)],
        bounds=Bounds(lb, ub),
        options={"gtol": gtol, "xtol": 1e-16, "maxiter": maxiter,
                 "verbose": 0})

    U = res.x.reshape(N, nur)
    X = np.asarray(rollout(jnp.asarray(U)))
    F = U[:, 3 * nl:].reshape(N, nl, 3)
    eF = enable[:, :, None] * F
    foot_pos = X[:, 9:].reshape(N + 1, nl, 3)
    return eF.transpose(1, 2, 0), foot_pos.transpose(1, 2, 0), res
