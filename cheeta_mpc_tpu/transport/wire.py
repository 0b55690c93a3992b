"""Wire format: float32 serialization of observations and policies.

The reference ships policies over ROS as float32 arrays (flattened
controller, MPC_ROS_Interface.cpp:99-178 encode; MRT_ROS_Interface.cpp
readPolicyMsg:125-185 decode back to double). Same convention here: host
doubles are narrowed to float32 on the wire; numpy handles packing.

Layout (little-endian):
    observation: [time f64][mode u32][nx u32][state f32 x nx]
                 [nu u32][input f32 x nu]
    policy:      [t0 f64][N u32][nx u32][nu u32][has_K u8]
                 [times f64 x (N+1)][x f32 x (N+1)nx][u f32 x N nu]
                 [K f32 x N nu nx]?
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from cheeta_mpc_tpu.mpc.runtime import PolicyData, SystemObservation


def encode_observation(obs: SystemObservation) -> bytes:
    state = np.asarray(obs.state, np.float32)
    inp = (np.asarray(obs.input, np.float32) if obs.input is not None
           else np.zeros(0, np.float32))
    head = struct.pack("<dII", float(obs.time), int(obs.mode), state.size)
    return (head + state.tobytes() + struct.pack("<I", inp.size)
            + inp.tobytes())


def decode_observation(payload: bytes) -> SystemObservation:
    t, mode, nx = struct.unpack_from("<dII", payload, 0)
    off = struct.calcsize("<dII")
    state = np.frombuffer(payload, np.float32, nx, off).astype(np.float64)
    off += 4 * nx
    (nu,) = struct.unpack_from("<I", payload, off)
    off += 4
    inp = (np.frombuffer(payload, np.float32, nu, off).astype(np.float64)
           if nu else None)
    return SystemObservation(time=t, state=state, input=inp, mode=mode)


def encode_policy(policy: PolicyData) -> bytes:
    times = np.asarray(policy.times, np.float64)
    x = np.asarray(policy.x_traj, np.float32)
    u = np.asarray(policy.u_traj, np.float32)
    N, nu = u.shape
    nx = x.shape[1]
    has_k = policy.K is not None
    head = struct.pack("<dIIIB", float(times[0]), N, nx, nu, int(has_k))
    parts = [head, times.tobytes(), x.tobytes(), u.tobytes()]
    if has_k:
        parts.append(np.asarray(policy.K, np.float32).tobytes())
    return b"".join(parts)


def decode_policy(payload: bytes) -> PolicyData:
    t0, N, nx, nu, has_k = struct.unpack_from("<dIIIB", payload, 0)
    off = struct.calcsize("<dIIIB")
    times = np.frombuffer(payload, np.float64, N + 1, off)
    off += 8 * (N + 1)
    x = np.frombuffer(payload, np.float32, (N + 1) * nx,
                      off).astype(np.float64).reshape(N + 1, nx)
    off += 4 * (N + 1) * nx
    u = np.frombuffer(payload, np.float32, N * nu,
                      off).astype(np.float64).reshape(N, nu)
    off += 4 * N * nu
    K: Optional[np.ndarray] = None
    if has_k:
        K = np.frombuffer(payload, np.float32, N * nu * nx,
                          off).astype(np.float64).reshape(N, nu, nx)
    return PolicyData(times=times.copy(), x_traj=x, u_traj=u, K=K)
