"""MPC / MRT node split over the topic bus.

The two-process pattern of the reference (MPC_ROS_Interface planning node at
~50 Hz + MRT_ROS_Interface tracking side at ~400 Hz over ROS topics,
reference §2.6) as bus-connected nodes:

- :class:`MpcNode` — subscribes observations, runs one solve per new
  observation (synchronously, like the reference's subscriber callback,
  MPC_ROS_Interface.cpp:237-290), publishes the float32-wire policy; serves
  the reset handshake (reference ``_mpc_reset`` service :64-94).
- :class:`MrtNode` — publishes observations, drains at most one policy per
  tick into the double-buffered :class:`MrtBase` (the reference's custom
  callback queue ``spinMRT``/``callOne``, MRT_ROS_Interface.cpp:233-235),
  blocking initial-policy handshake (MRT_ROS_Dummy_Loop.cpp:51-71).

Nodes run in threads of one process; the bus itself is native C++ so the
same code can later back an inter-process shared-memory transport.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

from cheeta_mpc_tpu.mpc.runtime import MrtBase, PolicyData, SystemObservation
from cheeta_mpc_tpu.transport.bus import MessageBus
from cheeta_mpc_tpu.transport.wire import (decode_observation, decode_policy,
                                           encode_observation, encode_policy)

TOPICS = ("mpc_observation", "mpc_policy", "mpc_reset_req", "mpc_reset_ack")


def make_bus(native: bool = True) -> MessageBus:
    return MessageBus(TOPICS, native=native)


class MpcNode:
    """Planning-side node: one solve per fresh observation."""

    def __init__(self, bus: MessageBus,
                 solve_fn: Callable[[SystemObservation], PolicyData]):
        self._bus = bus
        self._solve_fn = solve_fn
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.solve_count = 0
        # Snapshot the reset baseline NOW, before any client can publish a
        # request: snapshotting inside the spin thread raced with an early
        # reset_mpc() (the request landed before the thread's first poll and
        # was absorbed into the baseline, never acked). The reference avoids
        # the class of bug with a blocking ROS service
        # (MRT_ROS_Interface.cpp:61-74).
        self._reset_baseline = bus.seq("mpc_reset_req")

    def launch(self) -> None:
        """Start the spin thread (reference launchNodes,
        MPC_ROS_Interface.cpp:330-352)."""
        self._thread = threading.Thread(target=self._spin, daemon=True)
        self._thread.start()

    def _spin(self) -> None:
        last_obs_seq = 0
        last_reset_seq = self._reset_baseline
        while not self._stop.is_set():
            # Reset service: ack immediately (solver state is functional).
            rseq = self._bus.seq("mpc_reset_req")
            if rseq > last_reset_seq:
                last_reset_seq = rseq
                self._bus.publish("mpc_reset_ack", b"ok")
            seq = self._bus.wait_for("mpc_observation", last_obs_seq,
                                     timeout_s=0.05)
            if seq <= last_obs_seq:
                continue
            seq, payload = self._bus.consume_latest("mpc_observation")
            if payload is None:
                continue
            last_obs_seq = seq
            obs = decode_observation(payload)
            policy = self._solve_fn(obs)
            self._bus.publish("mpc_policy", encode_policy(policy))
            self.solve_count += 1

    def shutdown(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)


class MrtNode(MrtBase):
    """Tracking-side node: observation out, at most one policy in per tick."""

    def __init__(self, bus: MessageBus):
        super().__init__()
        self._bus = bus
        self._last_policy_seq = 0

    def reset_mpc(self, timeout_s: float = 2.0) -> bool:
        """Blocking reset handshake (reference MRT_ROS_Interface.cpp:61-74)."""
        ack0 = self._bus.seq("mpc_reset_ack")
        self._bus.publish("mpc_reset_req", b"reset")
        return self._bus.wait_for("mpc_reset_ack", ack0, timeout_s) > ack0

    def set_current_observation(self, obs: SystemObservation) -> None:
        self._bus.publish("mpc_observation", encode_observation(obs))

    def spin_once(self) -> bool:
        """Drain at most one fresh policy into the buffer (the reference's
        callOne custom queue). Returns True if one arrived."""
        seq = self._bus.seq("mpc_policy")
        if seq <= self._last_policy_seq:
            return False
        seq, payload = self._bus.consume_latest("mpc_policy")
        if payload is None or seq <= self._last_policy_seq:
            return False
        self._last_policy_seq = seq
        self.move_to_buffer(decode_policy(payload))
        return True

    def wait_for_initial_policy(self, obs: SystemObservation,
                                timeout_s: float = 10.0) -> bool:
        """Initial handshake: publish observations until a policy arrives
        (reference MRT_ROS_Dummy_Loop.cpp:51-71)."""
        import time
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            self.set_current_observation(obs)
            self._bus.wait_for("mpc_policy", self._last_policy_seq,
                               timeout_s=0.1)
            if self.spin_once():
                self.update_policy()
                return True
        return False
