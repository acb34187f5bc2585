"""Training utilities for the 3-D U-Net: Dice+CE loss and a shardable train
step (DP over batch x TP over channels on a jax.sharding.Mesh).

The reference delegates training entirely to nnU-Net/PyTorch; here the train
step is a first-class jit program the driver's multi-chip dryrun exercises.
"""

from __future__ import annotations

import functools
from typing import Optional

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


# ---------------------------------------------------------------------------
# full training pipeline (the reference trains via external nnU-Net/PyTorch;
# reference nnunet/run.py:105-195 only consumes trained models)
# ---------------------------------------------------------------------------

def poly_lr_schedule(base_lr: float, total_steps: int, power: float = 0.9):
    """nnU-Net's polynomial decay: lr = base * (1 - t/T)^power."""
    def schedule(step):
        frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        return base_lr * (1.0 - frac) ** power
    return schedule


def deep_supervision_loss(outputs, labels, num_classes: int) -> jnp.ndarray:
    """Compound loss over the deep-supervision pyramid: each auxiliary head
    is matched against max-pooled labels, weighted 1/2^k (nnU-Net scheme)."""
    logits, aux = outputs if isinstance(outputs, tuple) else (outputs, [])
    total = dice_ce_loss(logits, labels, num_classes)
    weight = 1.0
    norm = 1.0
    lab = labels
    for head in aux:
        weight *= 0.5
        # downsample labels to the head's grid by strided max-pool (keeps
        # thin foreground alive better than NN subsampling)
        factors = tuple(
            lab.shape[i + 1] // head.shape[i + 1] for i in range(3)
        )
        if any(f > 1 for f in factors):
            lab = jax.lax.reduce_window(
                lab.astype(jnp.float32), -jnp.inf, jax.lax.max,
                (1,) + factors, (1,) + factors, "VALID",
            ).astype(labels.dtype)
        total = total + weight * dice_ce_loss(head, lab, num_classes)
        norm += weight
    return total / norm


def sample_patches(cases, tile_shape, batch_size: int, rng: "np.random.RandomState",
                   fg_fraction: float = 0.67):
    """Host-side patch sampler with foreground oversampling (nnU-Net's 2/3
    foreground-centred rule).  ``cases``: list of (image_zyx, label_zyx) numpy
    arrays.  Returns (images [B,z,y,x,1], labels [B,z,y,x])."""
    import numpy as np

    tz, ty, tx = tile_shape
    images, labels = [], []
    for _ in range(batch_size):
        img, lab = cases[rng.randint(len(cases))]
        nz, ny, nx = img.shape
        if rng.rand() < fg_fraction and lab.any():
            zz, yy, xx = np.nonzero(lab)
            k = rng.randint(len(zz))
            cz, cy, cx = zz[k], yy[k], xx[k]
            z0 = int(np.clip(cz - tz // 2, 0, max(nz - tz, 0)))
            y0 = int(np.clip(cy - ty // 2, 0, max(ny - ty, 0)))
            x0 = int(np.clip(cx - tx // 2, 0, max(nx - tx, 0)))
        else:
            z0 = rng.randint(max(nz - tz, 0) + 1)
            y0 = rng.randint(max(ny - ty, 0) + 1)
            x0 = rng.randint(max(nx - tx, 0) + 1)
        im = img[z0 : z0 + tz, y0 : y0 + ty, x0 : x0 + tx]
        lb = lab[z0 : z0 + tz, y0 : y0 + ty, x0 : x0 + tx]
        pad = [(0, tz - im.shape[0]), (0, ty - im.shape[1]), (0, tx - im.shape[2])]
        if any(p[1] for p in pad):
            im = np.pad(im, pad, mode="edge")
            lb = np.pad(lb, pad)
        images.append(im)
        labels.append(lb)
    import numpy as _np

    return (_np.stack(images)[..., None].astype(_np.float32),
            _np.stack(labels).astype(_np.int32))


@functools.partial(jax.jit, static_argnames=())
def augment_batch(key, images, labels):
    """On-device augmentation (the nnU-Net defaults that commute with jit):
    random axis flips, gamma, additive Gaussian noise, brightness/contrast.
    Spatial elastic/rotation augmentation lives in generation/augment.py and
    runs per-case at dataset build time."""
    k_flip, k_gamma, k_noise, k_bright, k_contrast = jax.random.split(key, 5)

    flips = jax.random.bernoulli(k_flip, 0.5, (3,))
    for axis in range(3):
        images = jnp.where(flips[axis], jnp.flip(images, axis=axis + 1), images)
        labels = jnp.where(flips[axis], jnp.flip(labels, axis=axis + 1), labels)

    # gamma on [0,1]-normalised intensities (per batch)
    lo = jnp.min(images)
    hi = jnp.max(images)
    span = jnp.maximum(hi - lo, 1e-6)
    norm = (images - lo) / span
    gamma = jnp.exp(jax.random.uniform(k_gamma, (), minval=-0.35, maxval=0.35))
    norm = norm ** gamma
    images = norm * span + lo

    noise_sd = 0.01 * span
    images = images + noise_sd * jax.random.normal(k_noise, images.shape)
    images = images * jax.random.uniform(k_bright, (), minval=0.9, maxval=1.1)
    mean = jnp.mean(images)
    contrast = jax.random.uniform(k_contrast, (), minval=0.9, maxval=1.1)
    images = (images - mean) * contrast + mean
    return images, labels


def make_ds_train_step(model, tx, num_classes: int):
    """Train step for a deep-supervision model (model.deep_supervision=True)."""

    @jax.jit
    def train_step(params, opt_state, images, labels):
        def loss_fn(p):
            outputs = model.apply(p, images)
            return deep_supervision_loss(outputs, labels, num_classes)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state_new = tx.update(grads, opt_state, params)
        params_new = optax.apply_updates(params, updates)
        return params_new, opt_state_new, loss

    return train_step


def fit(model, cases, *, tile_shape=(16, 64, 64), batch_size: int = 2,
        steps: int = 250, base_lr: float = 1e-2, seed: int = 0,
        num_classes: int = 2, augment: bool = True, momentum: float = 0.99,
        checkpoint_dir=None, log_every: int = 50):
    """Train a U-Net on (image, label) numpy cases: SGD+Nesterov with
    polynomial LR decay, foreground-oversampled patches, on-device
    augmentation, deep supervision when the model enables it (the nnU-Net
    recipe, TPU-native).  Returns (params, losses)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    schedule = poly_lr_schedule(base_lr, steps)
    tx = optax.chain(
        optax.clip_by_global_norm(12.0),
        optax.sgd(schedule, momentum=momentum, nesterov=True),
    )
    dummy = jnp.zeros((1,) + tuple(tile_shape) + (1,), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), dummy)
    opt_state = tx.init(params)
    step_fn = (make_ds_train_step if getattr(model, "deep_supervision", False)
               else make_train_step)(model, tx, num_classes)

    losses = []
    for step in range(steps):
        images, labels = sample_patches(cases, tile_shape, batch_size, rng)
        images, labels = jnp.asarray(images), jnp.asarray(labels)
        if augment:
            key, sub = jax.random.split(key)
            images, labels = augment_batch(sub, images, labels)
        params, opt_state, loss = step_fn(params, opt_state, images, labels)
        losses.append(float(loss))
        if log_every and step % log_every == 0:
            import logging

            logging.getLogger(__name__).info("step %d loss %.4f", step, losses[-1])
        if checkpoint_dir and (step + 1) % max(steps // 4, 1) == 0:
            save_checkpoint(checkpoint_dir, params, step + 1)
    return params, losses


def save_checkpoint(directory, params, step: int):
    """Orbax checkpoint (falls back to npz when orbax is unavailable)."""
    import os

    os.makedirs(directory, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(directory), f"step_{step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, params, force=True)
        ckptr.wait_until_finished()
    except Exception:
        import numpy as np

        flat, _ = jax.tree_util.tree_flatten(params)
        np.savez(os.path.join(directory, f"step_{step}.npz"),
                 **{str(i): np.asarray(l) for i, l in enumerate(flat)})
