"""MPC/MRT runtime: the real-time planner/tracker split.

Re-creates the capability surface of the reference's ``ocs2_mpc`` layer:

- :class:`SystemObservation` — {mode, time, state, input}
  (reference SystemObservation.h).
- :class:`PolicyData` — the policy bundle the MPC hands to the tracker
  ({CommandData, PrimalSolution, PerformanceIndex} in the reference).
- :class:`MrtBase` — the double-buffered policy handoff
  (reference MRT_BASE.cpp:156-232): ``move_to_buffer`` fills the back buffer
  under a lock; ``update_policy`` try-locks and swaps buffer -> active with a
  starvation warning counter; ``evaluate_policy`` interpolates the active
  policy (feedforward + optional feedback K(x - x*)).
- :class:`MpcMrtInterface` — single-process MPC+MRT
  (reference MPC_MRT_Interface.cpp:56-170): set observation, advance MPC
  (solve + buffer), query value function / gains.
- :class:`DummyLoop` — closed-loop simulator in deterministic lock-step mode
  (reference MRT_ROS_Dummy_Loop.cpp:76-129): the plant is the MPC's own
  model ("plant == model"), stepping at mrt_rate with one MPC solve every
  ``mpc_update_ratio`` ticks — the determinism trick SURVEY.md §4 calls out
  as the thing to keep for CI.

Host-side orchestration lives here; the solve itself is one jitted device
program. Device->host traffic per MPC step is only the policy buffer
(u_traj, x_traj, K), matching SURVEY.md §7's real-time-path guidance.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np


@dataclass
class SystemObservation:
    """Reference ocs2::SystemObservation (SystemObservation.h)."""

    time: float
    state: np.ndarray
    input: Optional[np.ndarray] = None
    mode: int = 15


@dataclass
class PolicyData:
    """One MPC policy: time-stamped open-loop trajectories + optional
    feedback gains (the reference's PrimalSolution + LinearController)."""

    times: np.ndarray  # (N+1,) node times
    x_traj: np.ndarray  # (N+1, nx)
    u_traj: np.ndarray  # (N, nu)
    K: Optional[np.ndarray] = None  # (N, nu, nx) Riccati feedback
    init_observation: Optional[SystemObservation] = None
    performance: Optional[dict] = None

    def interp_state(self, t: float) -> np.ndarray:
        return _interp_rows(self.times, self.x_traj, t)

    def evaluate(self, t: float, x: Optional[np.ndarray] = None) -> np.ndarray:
        """Policy input at time t: feedforward (+ K(x - x*) when gains and a
        measured state are available) — reference MRT_BASE::evaluatePolicy
        (MRT_BASE.cpp:104-119)."""
        tu = self.times[:-1]
        idx = int(np.clip(np.searchsorted(tu, t, side='right') - 1, 0,
                          len(tu) - 1))
        u = self.u_traj[idx].copy()
        if self.K is not None and x is not None:
            u = u + self.K[idx] @ (x - self.interp_state(t))
        return u


def _interp_rows(ts: np.ndarray, rows: np.ndarray, t: float) -> np.ndarray:
    t = float(np.clip(t, ts[0], ts[-1]))
    i = int(np.clip(np.searchsorted(ts, t, side='right') - 1, 0,
                    len(ts) - 2))
    w = (t - ts[i]) / max(ts[i + 1] - ts[i], 1e-12)
    return (1 - w) * rows[i] + w * rows[i + 1]


class MrtBase:
    """Double-buffered wait-free policy consumption
    (reference MRT_BASE.cpp:156-210)."""

    def __init__(self) -> None:
        self._buffer_lock = threading.Lock()
        self._buffer: Optional[PolicyData] = None
        self._active: Optional[PolicyData] = None
        self._new_policy_in_buffer = False
        self.trylock_failures = 0  # starvation warning counter (:172-179)
        self.observers: List[Callable[[PolicyData], None]] = []

    @property
    def initial_policy_received(self) -> bool:
        return self._active is not None or self._new_policy_in_buffer

    def move_to_buffer(self, policy: PolicyData) -> None:
        with self._buffer_lock:
            self._buffer = policy
            self._new_policy_in_buffer = True
        for obs in self.observers:
            obs(policy)

    def update_policy(self) -> bool:
        """Try-lock swap buffer -> active; returns True if a fresh policy was
        activated."""
        acquired = self._buffer_lock.acquire(blocking=False)
        if not acquired:
            self.trylock_failures += 1
            return False
        try:
            if not self._new_policy_in_buffer:
                return False
            self._active, self._buffer = self._buffer, self._active
            self._new_policy_in_buffer = False
            return True
        finally:
            self._buffer_lock.release()

    def evaluate_policy(self, t: float,
                        x: Optional[np.ndarray] = None) -> np.ndarray:
        if self._active is None:
            raise RuntimeError("no policy received yet")
        return self._active.evaluate(t, x)

    @property
    def active_policy(self) -> Optional[PolicyData]:
        return self._active


class MpcMrtInterface(MrtBase):
    """Single-process MPC + MRT (reference MPC_MRT_Interface.cpp).

    ``solve_fn(observation) -> PolicyData`` wraps the jitted solver plus its
    reference/gait plumbing (supplied by the application layer).
    """

    def __init__(self, solve_fn: Callable[[SystemObservation], PolicyData]):
        super().__init__()
        self._solve_fn = solve_fn
        self._obs_lock = threading.Lock()
        self._observation: Optional[SystemObservation] = None
        self.solve_count = 0

    def set_current_observation(self, obs: SystemObservation) -> None:
        with self._obs_lock:
            self._observation = obs

    def advance_mpc(self) -> PolicyData:
        with self._obs_lock:
            obs = self._observation
        if obs is None:
            raise RuntimeError("no observation set")
        policy = self._solve_fn(obs)
        policy.init_observation = obs
        self.move_to_buffer(policy)
        self.solve_count += 1
        return policy


@dataclass
class DummyLoopResult:
    times: np.ndarray
    states: np.ndarray
    inputs: np.ndarray
    solves: int


def run_dummy_loop(interface: MpcMrtInterface,
                   plant_step: Callable[[float, np.ndarray, np.ndarray],
                                        np.ndarray],
                   x0: np.ndarray,
                   mrt_dt: float,
                   mpc_update_ratio: int,
                   n_steps: int,
                   use_feedback: bool = True) -> DummyLoopResult:
    """Deterministic lock-step closed loop (reference
    MRT_ROS_Dummy_Loop.cpp:76-129 synchronized mode): one MPC solve every
    ``mpc_update_ratio`` MRT ticks, plant == model via ``plant_step``."""
    t = 0.0
    x = np.asarray(x0, dtype=np.float64).copy()
    times, states, inputs = [t], [x.copy()], []

    interface.set_current_observation(SystemObservation(time=t, state=x))
    interface.advance_mpc()
    assert interface.update_policy()

    for step in range(n_steps):
        if step > 0 and step % mpc_update_ratio == 0:
            interface.set_current_observation(
                SystemObservation(time=t, state=x))
            interface.advance_mpc()
            interface.update_policy()
        u = interface.evaluate_policy(t, x if use_feedback else None)
        x = plant_step(t, x, u)
        t += mrt_dt
        times.append(t)
        states.append(x.copy())
        inputs.append(u)
    return DummyLoopResult(times=np.asarray(times), states=np.stack(states),
                           inputs=np.stack(inputs),
                           solves=interface.solve_count)
