from cheeta_mpc_tpu.core.types import (  # noqa: F401
    CostApprox,
    DynamicsLin,
    OcpQpData,
    OcpQpSolution,
    PerformanceIndex,
    StageConstraint,
)
