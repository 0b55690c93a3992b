from cheeta_mpc_tpu.solvers.scp import (ScpResult, ScpSettings,  # noqa: F401
                                        StepInfo, make_performance,
                                        solve_nonlinear_ocp)
