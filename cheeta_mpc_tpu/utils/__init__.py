from cheeta_mpc_tpu.utils.timing import RepeatedTimer, Benchmarker  # noqa: F401
