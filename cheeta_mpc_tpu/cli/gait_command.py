"""Gait command node (reference LeggedRobotGaitCommandNode +
GaitKeyboardPublisher, ocs2_legged_robot_ros/src/gait/
GaitKeyboardPublisher.cpp:46-74): loads the gait library from gait.info and
publishes the selected mode-sequence template.

Usage:
    python -m cheeta_mpc_tpu.cli.gait_command [gait.info path]
Then type a gait name (stance, trot, flying_trot, ...) per line.

Instead of a ROS topic, the selection is appended to a command file (or
handed to a callback when used as a library) — the MPC application inserts it
into its GaitSchedule at the next solve, mirroring the reference's
solver-synchronized GaitReceiver hook.
"""

from __future__ import annotations

import sys
from typing import Callable, Optional

DEFAULT_GAIT_INFO = \
    "/root/reference/ocs2_legged_robot/config/command/gait.info"


def run(gait_info_path: str = DEFAULT_GAIT_INFO,
        on_command: Optional[Callable] = None,
        stdin=None, stdout=None) -> None:
    from cheeta_mpc_tpu.utils.info_config import load_gait_library
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    library = load_gait_library(gait_info_path)
    names = list(library)
    print(f"Gait library: {', '.join(names)}", file=stdout)
    print("Enter a gait name (Ctrl-D to quit):", file=stdout)
    for line in stdin:
        name = line.strip().lower()
        if not name:
            continue
        if name not in library:
            print(f"unknown gait '{name}' (choose from {', '.join(names)})",
                  file=stdout)
            continue
        template = library[name]
        if on_command is not None:
            on_command(name, template)
        print(f"commanded gait '{name}' "
              f"(cycle {template.duration:.2f} s, "
              f"{len(template.mode_sequence)} phases)", file=stdout)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_GAIT_INFO)
