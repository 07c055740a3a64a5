"""Sharded train/eval steps over a device mesh.

One jitted function replaces the reference's DDP forward/backward/allreduce/
clip/Noam step (runners/train.py:16-28): gradients over the trainable tree
(LoRA adapters under ``--peft``, everything otherwise), with GSPMD inserting
the gradient reductions over the ("dp","fsdp") axes from the sharding
annotations — no process groups, no explicit allreduce.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ecg_byte_tpu.models import transformer as tfm
from ecg_byte_tpu.models import lora as lora_lib
from ecg_byte_tpu.models.config import TransformerConfig
from ecg_byte_tpu.parallel import sharding as shd

Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Carries everything the step mutates.  ``base`` holds frozen params
    when training LoRA only; otherwise ``trainable`` is the full tree and
    ``base`` is None."""

    trainable: Any
    base: Any
    opt_state: Any
    step: jax.Array

    def full_params(self):
        return self.base if self.base is not None else self.trainable

    def lora(self):
        return self.trainable if self.base is not None else None


def create_train_state(
    config: TransformerConfig,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    *,
    peft: bool = True,
    params: Optional[Params] = None,
) -> TrainState:
    """Initialize params (unless given) and optimizer state.

    ``peft=True`` mirrors the reference's LoRA mode (main.py:153-155): only
    adapters train, the base model is frozen.
    """
    p_rng, l_rng = jax.random.split(rng)
    if params is None:
        params = tfm.init_params(config, p_rng)
    if peft:
        lora = lora_lib.init_lora(config, l_rng)
        opt_state = optimizer.init(lora)
        return TrainState(
            trainable=lora, base=params, opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )
    opt_state = optimizer.init(params)
    return TrainState(
        trainable=params, base=None, opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )


def _loss_from_batch(config, params, lora, batch, dropout_rng, mesh,
                     remat="dots", chunked_loss=False, scan_unroll=1):
    input_ids = batch["input_ids"]
    if mesh is not None:
        input_ids = shd.constrain(input_ids, mesh, shd.batch_spec())
    hidden = tfm.forward(
        params,
        config,
        input_ids,
        batch.get("attn_mask"),
        batch.get("position_ids"),
        lora=lora,
        dropout_rng=dropout_rng,
        remat=remat,
        return_hidden=True,
        scan_unroll=scan_unroll,
    )
    if chunked_loss:
        return tfm.chunked_lm_loss(
            params, config, hidden, batch["labels"], mesh=mesh
        )
    return tfm.lm_loss_from_hidden(params, config, hidden, batch["labels"])


def make_train_step(
    config: TransformerConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    *,
    remat="dots",
    chunked_loss: bool = False,
    scan_unroll=True,
) -> Callable:
    """Build the jitted ``(state, batch, rng) -> (state, loss)`` step.

    ``remat`` follows :func:`transformer._scan_layers`: ``"dots"``
    (default) saves matmul outputs and recomputes only attention softmax +
    elementwise on backward — the safe mode at any batch size; ``True``
    is full per-layer remat (cheapest memory); ``False`` saves everything
    and is the FASTEST when the batch fits HBM (207 vs 234 ms/step at the
    flagship 4x1024 on v5e) — viable since the resident-attention kernel
    (ops/attention_resident.py) stopped the scan from keeping (S, S)
    residuals.  ``chunked_loss=True`` computes the cross entropy
    from hidden states in vocab tiles (models/transformer.chunked_lm_loss)
    instead of materializing the (B, S, V) logits — the memory hog for
    132k-vocab training.

    ``scan_unroll=True`` (default) unrolls the layer scan in the step:
    saved residuals become plain buffers instead of DUS-stacked arrays
    (195.4 -> 188.1 ms/step at the flagship 4x1024 on v5e) at the price
    of an L-body compile; pass 1 to keep the rolled scan for fast
    iteration on deep configs."""

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(trainable):
            if state.base is not None:
                params, lora = state.base, trainable
            else:
                params, lora = trainable, None
            return _loss_from_batch(
                config, params, lora, batch, dropout_rng, mesh, remat=remat,
                chunked_loss=chunked_loss, scan_unroll=scan_unroll,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.trainable
        )
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(
            trainable=trainable,
            base=state.base,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, loss

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(
    config: TransformerConfig, mesh: Optional[Mesh] = None
) -> Callable:
    """Jitted ``(state, batch) -> loss`` (no dropout, no grads)."""

    def eval_step(state: TrainState, batch):
        return _loss_from_batch(
            config, state.full_params(), state.lora(), batch, None, mesh
        )

    return jax.jit(eval_step)


def shard_state(state: TrainState, config, mesh: Mesh, *, peft: bool = True,
                fsdp: bool = False) -> TrainState:
    """Place an existing TrainState onto the mesh per the sharding rules.

    Optimizer-state leaves (Adam moments) mirror the trainable tree shapes
    and inherit its specs by shape matching; anything else replicates.
    """
    pspecs = shd.param_specs(config, fsdp=fsdp)
    if peft:
        t_specs = shd.lora_specs(config, state.trainable)
        base = shd.shard_tree(state.base, pspecs, mesh)
    else:
        t_specs = pspecs
        base = None
    trainable = shd.shard_tree(state.trainable, t_specs, mesh)

    shape_to_spec = {}
    for leaf, spec in zip(
        jax.tree.leaves(state.trainable),
        jax.tree.leaves(t_specs, is_leaf=lambda s: isinstance(s, P)),
    ):
        shape_to_spec.setdefault(leaf.shape, spec)

    def place(x):
        spec = shape_to_spec.get(getattr(x, "shape", None), P())
        return jax.device_put(x, NamedSharding(mesh, spec))

    opt_state = jax.tree.map(place, state.opt_state)
    return TrainState(
        trainable=trainable,
        base=base,
        opt_state=opt_state,
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )
