"""Pose command utility (reference LeggedRobotPoseCommandNode.cpp:48-120):
convert a displacement command [dx, dy, dz, dyaw_deg] into a two-point
target trajectory with a velocity-based arrival time.
"""

from __future__ import annotations

import sys

import numpy as np

TARGET_DISPLACEMENT_VELOCITY = 0.5  # m/s (reference reference.info)
TARGET_ROTATION_VELOCITY = 1.57  # rad/s


def command_to_target(current_pose: np.ndarray, dx: float, dy: float,
                      dz: float, dyaw_deg: float,
                      v_lin: float = TARGET_DISPLACEMENT_VELOCITY,
                      v_rot: float = TARGET_ROTATION_VELOCITY):
    """Returns (times (2,), poses (2, 4)): [x, y, z, yaw] now and at arrival.

    Arrival time = max(linear displacement / v_lin, rotation / v_rot)
    (reference estimateTimeToTarget semantics).
    """
    dyaw = np.deg2rad(dyaw_deg)
    disp = np.linalg.norm([dx, dy, dz])
    t_arrival = max(disp / v_lin, abs(dyaw) / v_rot, 1e-3)
    target = np.asarray(current_pose, float) + np.asarray([dx, dy, dz, dyaw])
    return (np.array([0.0, t_arrival]),
            np.stack([np.asarray(current_pose, float), target]))


def run(stdin=None, stdout=None):
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    pose = np.zeros(4)
    print("Enter: dx dy dz dyaw_deg (Ctrl-D to quit)", file=stdout)
    for line in stdin:
        try:
            dx, dy, dz, dyaw = (float(v) for v in line.split())
        except ValueError:
            print("expected 4 numbers", file=stdout)
            continue
        times, poses = command_to_target(pose, dx, dy, dz, dyaw)
        pose = poses[-1]
        print(f"target at t+{times[-1]:.2f}s: "
              f"x={pose[0]:.2f} y={pose[1]:.2f} z={pose[2]:.2f} "
              f"yaw={np.rad2deg(pose[3]):.1f}deg", file=stdout)


if __name__ == "__main__":
    run()
