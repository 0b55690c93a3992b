from cheeta_mpc_tpu.models.centroidal import (  # noqa: F401
    CentroidalParams,
    centroidal_step,
    pack_state,
    unpack_state,
)
