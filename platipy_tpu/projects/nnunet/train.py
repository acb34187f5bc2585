"""Training utilities for the 3-D U-Net: Dice+CE loss and a shardable train
step (DP over batch x TP over channels on a jax.sharding.Mesh).

The reference delegates training entirely to nnU-Net/PyTorch; here the train
step is a first-class jit program the driver's multi-chip dryrun exercises.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["dice_ce_loss", "make_train_step", "shard_params_for_tp", "create_train_state"]


def dice_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Soft Dice + cross entropy (the nnU-Net compound loss)."""
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    ce = optax.softmax_cross_entropy(logits, one_hot).mean()

    probs = jax.nn.softmax(logits, axis=-1)
    axes = tuple(range(1, logits.ndim - 1))  # spatial axes
    intersect = jnp.sum(probs * one_hot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(one_hot, axis=axes)
    dice = (2.0 * intersect + 1e-5) / (denom + 1e-5)
    dice_loss = 1.0 - dice.mean()
    return ce + dice_loss


def create_train_state(model, rng, tile_shape=(16, 64, 64), learning_rate=1e-3):
    """Initialise params and an optax optimiser state."""
    dummy = jnp.zeros((1,) + tuple(tile_shape) + (1,), jnp.float32)
    params = model.init(rng, dummy)
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)
    return params, tx, opt_state


def make_train_step(model, tx, num_classes: int):
    """Returns a jittable (params, opt_state, batch) -> (params, opt_state, loss)
    step.  Shard inputs/params with NamedSharding before calling to distribute:
    batch over a 'data' mesh axis, channel dims of kernels over 'model'."""

    @jax.jit
    def train_step(params, opt_state, images, labels):
        def loss_fn(p):
            logits = model.apply(p, images)
            return dice_ce_loss(logits, labels, num_classes)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state_new = tx.update(grads, opt_state, params)
        params_new = optax.apply_updates(params, updates)
        return params_new, opt_state_new, loss

    return train_step


def shard_params_for_tp(params, mesh, model_axis: str = "model"):
    """Tensor-parallel sharding: split every conv kernel's output-channel dim
    over the mesh's model axis (GSPMD inserts the collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis_size = mesh.shape[model_axis]

    def shard_leaf(x):
        if x.ndim >= 2 and x.shape[-1] % axis_size == 0:
            spec = P(*([None] * (x.ndim - 1) + [model_axis]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(shard_leaf, params)
