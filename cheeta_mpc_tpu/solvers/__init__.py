from cheeta_mpc_tpu.solvers.scp import ScpSettings, solve_nonlinear_ocp  # noqa: F401
