"""3-D U-Net (nnU-Net architecture family) in Flax.

TPU-native replacement for the reference's PyTorch/CUDA nnU-Net delegation
(platipy/imaging/projects/nnunet/run.py:105-195).  The network follows the
nnU-Net plan family: per stage two (conv -> instance norm -> leaky ReLU)
blocks, strided-conv downsampling, transposed-conv upsampling, deep
supervision heads.  Convolutions run in bfloat16 on the MXU with float32
parameters/normalisation statistics.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["UNet3D", "default_unet"]


class ConvBlock(nn.Module):
    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # explicit (1,1) padding: torch (nnU-Net) pads 3x3x3 convs
        # symmetrically; flax "SAME" pads stride-2 convs (0,1), shifting the
        # grid by one and breaking converted-weight parity
        x = nn.Conv(
            self.features, kernel_size=(3, 3, 3), strides=self.stride,
            padding=((1, 1), (1, 1), (1, 1)),
            dtype=self.compute_dtype, param_dtype=jnp.float32,
        )(x)
        # instance norm in f32 for stability
        x = x.astype(jnp.float32)
        x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return x.astype(self.compute_dtype)


class StageBlock(nn.Module):
    features: int
    first_stride: Tuple[int, int, int]
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(self.features, self.first_stride, self.compute_dtype)(x)
        x = ConvBlock(self.features, (1, 1, 1), self.compute_dtype)(x)
        return x


class UNet3D(nn.Module):
    """nnU-Net-style encoder/decoder.

    Input:  [batch, z, y, x, channels]
    Output: [batch, z, y, x, num_classes] logits (float32)
    """

    num_classes: int = 2
    features: Sequence[int] = (32, 64, 128, 256)
    strides: Sequence[Tuple[int, int, int]] = ((1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    compute_dtype: jnp.dtype = jnp.bfloat16
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)

        skips = []
        for feats, stride in zip(self.features, self.strides):
            x = StageBlock(feats, stride, self.compute_dtype)(x)
            skips.append(x)

        outputs = []
        y = skips[-1]
        for level in range(len(self.features) - 2, -1, -1):
            feats = self.features[level]
            up_stride = self.strides[level + 1]
            y = nn.ConvTranspose(
                feats, kernel_size=up_stride, strides=up_stride,
                dtype=self.compute_dtype, param_dtype=jnp.float32,
            )(y)
            y = jnp.concatenate([y, skips[level]], axis=-1)
            y = StageBlock(feats, (1, 1, 1), self.compute_dtype)(y)
            if self.deep_supervision and level > 0:
                outputs.append(
                    nn.Conv(self.num_classes, (1, 1, 1), dtype=self.compute_dtype,
                            param_dtype=jnp.float32,
                            name=f"ds_head_{level}")(y).astype(jnp.float32)
                )

        # fixed name so checkpoints transfer between deep-supervision and
        # inference (deep_supervision=False) instantiations
        logits = nn.Conv(
            self.num_classes, (1, 1, 1), dtype=self.compute_dtype,
            param_dtype=jnp.float32, name="seg_head",
        )(y).astype(jnp.float32)

        if self.deep_supervision:
            return logits, outputs[::-1]
        return logits


def default_unet(num_classes: int = 2, features=(32, 64, 128, 256),
                 strides=None) -> UNet3D:
    """UNet3D with the nnU-Net default stride rule when ``strides`` is not
    pinned explicitly: no pooling at the first stage, isotropic 2x after —
    one stride per feature stage (a fixed 4-entry default would silently
    TRUNCATE deeper registry architectures via zip)."""
    features = tuple(features)
    if strides is None:
        strides = ((1, 1, 1),) + ((2, 2, 2),) * (len(features) - 1)
    return UNet3D(num_classes=num_classes, features=features,
                  strides=tuple(tuple(s) for s in strides))
