"""Device-mesh parallelism: sharding specs + mesh helpers (GSPMD/pjit).

Replaces the reference's DDP/NCCL distribution (main.py:57-60,164-165,
356-364) with JAX shardings over a `jax.sharding.Mesh`: gradients reduce via
compiler-inserted collectives over the data axes; tensor parallelism shards
attention heads and MLP hidden dims megatron-style; fsdp shards parameters
over the data axis (ZeRO-3).
"""

from ecg_byte_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    default_mesh,
    local_device_count,
)
from ecg_byte_tpu.parallel.sharding import (  # noqa: F401
    param_specs,
    lora_specs,
    batch_spec,
    constrain,
    shard_tree,
)
