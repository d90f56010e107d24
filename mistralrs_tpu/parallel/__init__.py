"""Multi-chip parallelism (the analog of `mistralrs-quant/src/distributed/`).

TPU-native replacement for NCCL/Ring comms: a `jax.sharding.Mesh` over
ICI/DCN, `shard_map`-wrapped model forward with XLA collectives (psum /
all_gather) at the row-parallel boundaries, and NamedSharding placement of
the quantized weight pytrees.
"""

from .tp import (
    build_mesh,
    local_config,
    resolve_tp,
    shard_weights,
    tp_forward_fn,
    weight_pspecs,
)

__all__ = [
    "build_mesh",
    "local_config",
    "resolve_tp",
    "shard_weights",
    "tp_forward_fn",
    "weight_pspecs",
]
