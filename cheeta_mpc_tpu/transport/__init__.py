from cheeta_mpc_tpu.transport.bus import MessageBus  # noqa: F401
from cheeta_mpc_tpu.transport.mpc_mrt import (  # noqa: F401
    MpcNode,
    MrtNode,
)
from cheeta_mpc_tpu.transport.wire import (  # noqa: F401
    decode_observation,
    decode_policy,
    encode_observation,
    encode_policy,
)
