"""Data-parallel plumbing for the two-stage CLIs' ``--dis`` flag.

The reference wraps stage-1/stage-2 training in single-node DDP
(pretrain.py:52-55, finetune.py:59-62).  Here data parallelism is pure
GSPMD: params stay replicated, the batch is placed sharded over a
``dp`` mesh axis, and XLA partitions the jitted step and inserts the
gradient/contrastive reductions (the MERL global-batch gather included)
automatically.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ecg_byte_tpu.parallel import make_mesh


def make_data_mesh() -> Mesh:
    """All local devices on one ``dp`` axis."""
    return make_mesh(dp=len(jax.devices()))


def shard_batch(batch, mesh: Mesh):
    """Place every array leaf sharded on dim 0 over ``dp`` (scalars and
    non-divisible leading dims replicate)."""
    n = mesh.shape["dp"]

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0:
            spec = P("dp", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: place(v) for k, v in batch.items()}
