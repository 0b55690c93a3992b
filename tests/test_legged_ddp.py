"""Legged DDP/SLQ MPC node: the reference's alternative-solver path
(`LeggedRobotDdpMpcNode.cpp:42-78`) assembled on the SRBD task and driven
closed-loop through the MPC/MRT runtime — the round-1 VERDICT's missing
component #63."""

import jax
import jax.numpy as jnp
import numpy as np

from cheeta_mpc_tpu.gait.schedule import GaitSchedule, trot_template
from cheeta_mpc_tpu.gait.swing import SwingConfig, SwingTrajectoryPlanner
from cheeta_mpc_tpu.models.quadruped_kinematics import foot_positions_world
from cheeta_mpc_tpu.models.srbd_legged import srbd_step
from cheeta_mpc_tpu.mpc.legged_ddp import build_legged_ddp_solver
from cheeta_mpc_tpu.mpc.legged_mpc import (LeggedMpcConfig,
                                           make_standing_reference,
                                           make_velocity_command_reference)
from cheeta_mpc_tpu.mpc.runtime import (MpcMrtInterface, PolicyData,
                                        SystemObservation, run_dummy_loop)
from cheeta_mpc_tpu.solvers.ddp import DdpSettings

TASK_INFO = "/root/reference/ocs2_legged_robot/config/mpc/task.info"
DEFAULT_JOINTS = np.array([0., 0.4, -0.8, 0., -0.4, 0.8,
                           0., 0.4, -0.8, 0., -0.4, 0.8])

CFG = LeggedMpcConfig.from_task_info(TASK_INFO, horizon=10,
                                     dtype=jnp.float64)
N = CFG.horizon
DT = CFG.params.dt


def standing_state():
    feet_b = np.asarray(foot_positions_world(
        CFG.params.desc, jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(DEFAULT_JOINTS)))
    x0 = np.zeros(24)
    x0[8] = -feet_b[:, 2].mean()
    x0[12:] = DEFAULT_JOINTS
    return x0


def test_ddp_standing_solve():
    """Standing task: DDP converges to weight-supporting stance forces."""
    solve = jax.jit(build_legged_ddp_solver(CFG, DdpSettings(iterations=5)))
    x0 = standing_state()
    x_ref = make_standing_reference(CFG, x0)
    enable = np.ones((N, 4))
    zp = np.zeros((N, 4))
    zv = np.zeros((N, 4))
    sol = solve(x0, x_ref, enable, zp, zv)
    forces = np.asarray(sol.forces)
    assert np.isfinite(forces).all()
    assert (forces[:, :, 2] > 1.0).all()
    # Total vertical force carries the robot's weight.
    from cheeta_mpc_tpu.models.srbd_legged import GRAVITY
    m = float(CFG.params.desc.mass)
    fz_total = forces[:, :, 2].sum(axis=1)
    np.testing.assert_allclose(fz_total, m * GRAVITY, rtol=0.15)
    # Friction cone respected (barrier keeps iterates interior).
    ft = np.sqrt(forces[:, :, 0] ** 2 + forces[:, :, 1] ** 2)
    assert (ft <= CFG.friction_mu * forces[:, :, 2] + 1e-6).all()


def test_closed_loop_ddp_walks():
    """Stance -> trot closed loop under the DDP MPC: upright, forward
    progress, deterministic (the LeggedRobotDdpMpcNode role end-to-end)."""
    solve = jax.jit(build_legged_ddp_solver(CFG, DdpSettings(iterations=5)))

    gs = GaitSchedule.stance(trot_template(0.6), t0=0.0)
    gs.phase_transition_stance_time = 0.1
    gs.insert_template(trot_template(0.6), insert_time=0.2)
    ms = gs.get_mode_schedule(0.0, 3.0)
    planner = SwingTrajectoryPlanner(SwingConfig(), num_feet=4)
    planner.update(ms, terrain_height=0.0)

    v_cmd = np.array([0.25, 0.0, 0.0])
    x0 = standing_state()

    def solve_fn(obs: SystemObservation) -> PolicyData:
        t, x = obs.time, obs.state
        x_ref = make_velocity_command_reference(CFG, x, v_cmd,
                                                com_height=x0[8])
        enable = np.stack([np.asarray(ms.contact_flags_at(t + (k + 0.5) * DT))
                           for k in range(N)])
        z_pos, z_vel = planner.sample_grid(t0=t + 0.5 * DT, dt=DT, horizon=N)
        sol = solve(jnp.asarray(x), jnp.asarray(x_ref), jnp.asarray(enable),
                    jnp.asarray(z_pos.T), jnp.asarray(z_vel.T))
        return PolicyData(times=t + DT * np.arange(N + 1),
                          x_traj=np.asarray(sol.x_traj),
                          u_traj=np.asarray(sol.u_traj),
                          K=np.asarray(sol.gains_K))

    def plant_step(t, x, u):
        enable = np.asarray(ms.contact_flags_at(t + 0.5 * DT))
        return np.asarray(srbd_step(CFG.params, jnp.asarray(x),
                                    jnp.asarray(u), jnp.asarray(enable)))

    n_steps = 60
    res = run_dummy_loop(MpcMrtInterface(solve_fn), plant_step, x0=x0,
                         mrt_dt=DT, mpc_update_ratio=2, n_steps=n_steps,
                         use_feedback=True)
    xs = res.states
    assert np.isfinite(xs).all()
    assert np.abs(xs[:, 10:12]).max() < 0.25, "robot tipped over"
    assert np.abs(xs[:, 8] - x0[8]).max() < 0.08, "height lost"
    t_end = n_steps * DT
    progress = xs[-1, 6] - x0[6]
    assert progress > 0.3 * v_cmd[0] * (t_end - 0.2), (
        f"no forward progress: {progress:.3f} m in {t_end:.2f} s")
    res2 = run_dummy_loop(MpcMrtInterface(solve_fn), plant_step, x0=x0,
                          mrt_dt=DT, mpc_update_ratio=2, n_steps=n_steps,
                          use_feedback=True)
    np.testing.assert_array_equal(res.states, res2.states)


def test_ddp_settings_from_task_info():
    """The ddp block of the reference task.info is ingested faithfully
    (task.info:50-99): SLQ, 1 iteration, line-search ladder from
    max/minStepLength, hessianCorrectionMultiple as reg."""
    s = DdpSettings.from_task_info(TASK_INFO)
    assert s.algorithm == "SLQ"
    assert s.iterations == 1  # maxNumIterations
    assert s.min_rel_cost == 0.1
    assert s.constraint_penalty == 20.0
    assert s.reg == 1e-5  # lineSearch.hessianCorrectionMultiple
    assert s.alphas[0] == 1.0  # maxStepLength
    assert s.alphas[-1] >= 1e-2  # minStepLength floor
    assert all(a > b for a, b in zip(s.alphas, s.alphas[1:]))
    # Overrides win (node-level iteration bumps).
    assert DdpSettings.from_task_info(TASK_INFO, iterations=7).iterations == 7


def test_ddp_value_function_and_convergence():
    """DDP exposes the value-function surface {P, p} like the SQP path and
    classifies convergence per ddp.minRelCost; P is PSD along the horizon."""
    solve = jax.jit(build_legged_ddp_solver(CFG, DdpSettings(iterations=5)))
    x0 = standing_state()
    x_ref = make_standing_reference(CFG, x0)
    ones = np.ones((N, 4))
    zeros = np.zeros((N, 4))
    sol = solve(x0, x_ref, ones, zeros, zeros)
    P = np.asarray(sol.gains_P)
    p = np.asarray(sol.gains_p)
    assert P.shape == (N + 1, 24, 24) and p.shape == (N + 1, 24)
    assert np.isfinite(P).all() and np.isfinite(p).all()
    eigs = np.linalg.eigvalsh(0.5 * (P + P.transpose(0, 2, 1)))
    assert eigs.min() > -1e-6 * max(1.0, eigs.max())
    # On the standing task 5 iterations are plenty: final improvement tiny.
    assert bool(sol.converged)


def test_sqp_vs_ddp_cross_check():
    """The two solver paths (hard-constrained SQP vs penalty SLQ) agree on
    the standing scenario's physics: same weight distribution and CoM
    trajectory to penalty-method tolerance (reference parity:
    LeggedRobotSqpMpcNode vs LeggedRobotDdpMpcNode on one task)."""
    from cheeta_mpc_tpu.mpc.legged_mpc import build_legged_solver
    from cheeta_mpc_tpu.ops.ocpqp import IpmSettings
    from cheeta_mpc_tpu.solvers.scp import ScpSettings

    x0 = standing_state()
    x_ref = make_standing_reference(CFG, x0)
    ones = np.ones((N, 4))
    zeros = np.zeros((N, 4))
    sol_d = jax.jit(build_legged_ddp_solver(CFG, DdpSettings(iterations=5)))(
        x0, x_ref, ones, zeros, zeros)
    sol_s = jax.jit(build_legged_solver(
        CFG, ScpSettings(iterations=2, ipm=IpmSettings(iters=10))))(
        x0, x_ref, ones, zeros, zeros)
    f_d = np.asarray(sol_d.forces)
    f_s = np.asarray(sol_s.forces)
    # Per-node total vertical force: both support the weight.
    np.testing.assert_allclose(f_d[:, :, 2].sum(axis=1),
                               f_s[:, :, 2].sum(axis=1), rtol=0.1)
    # Per-leg vertical forces agree to penalty-method tolerance.
    np.testing.assert_allclose(f_d[:, :, 2], f_s[:, :, 2],
                               atol=0.15 * np.abs(f_s[:, :, 2]).max())
    # CoM height trajectories agree.
    np.testing.assert_allclose(np.asarray(sol_d.x_traj)[:, 8],
                               np.asarray(sol_s.x_traj)[:, 8], atol=5e-3)


def test_planner_assembly_ddp_policy_has_value_function():
    """LeggedPlannerAssembly in DDP mode (the LeggedRobotDdpMpcNode wiring):
    task.info-configured DdpSettings, one planning tick produces a policy
    with the value-function surface {P, p} filled like the SQP mode."""
    from cheeta_mpc_tpu.gait.schedule import GaitSchedule, trot_template
    from cheeta_mpc_tpu.mpc.legged_node import (LeggedPlannerAssembly,
                                                PlannerSettings,
                                                default_stance_state)
    from cheeta_mpc_tpu.mpc.runtime import SystemObservation

    cfg = LeggedMpcConfig.from_task_info(TASK_INFO, horizon=8,
                                         dtype=jnp.float64)
    gs = GaitSchedule.stance(trot_template(0.6), t0=0.0)
    x0 = default_stance_state(cfg)
    ddp = DdpSettings.from_task_info(TASK_INFO, iterations=3)
    assembly = LeggedPlannerAssembly(
        cfg, gs, x0, v_cmd=np.zeros(3),
        settings=PlannerSettings(solver="ddp", ddp=ddp))
    pol = assembly.solve_fn(SystemObservation(time=0.0, state=x0,
                                              input=None, mode=0))
    assert pol.P is not None and pol.p is not None
    assert pol.P.shape == (cfg.horizon + 1, 24, 24)
    assert np.isfinite(pol.P).all() and np.isfinite(pol.p).all()
    assert np.isfinite(pol.u_traj).all()
    assert "converged" in assembly.last_metrics
