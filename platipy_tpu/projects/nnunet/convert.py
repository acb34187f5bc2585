"""nnU-Net (PyTorch Generic_UNet) -> UNet3D weight conversion.

The reference consumes nnU-Net-trained models via predict_from_folder
(reference nnunet/run.py:105-195).  Here, a trained nnU-Net v1 checkpoint's
``state_dict`` converts into this framework's Flax ``UNet3D`` parameters so
inference runs on TPU.  Architecture mapping (Generic_UNet, 3d_fullres):

  conv_blocks_context.{i}.blocks.{j}      -> encoder StageBlock i, ConvBlock j
  conv_blocks_context.{last}.{0,1}...     -> bottleneck StageBlock's two blocks
  tu.{k}                                  -> decoder ConvTranspose k
  conv_blocks_localization.{k}.{0,1}      -> decoder StageBlock's two blocks
  seg_outputs.{last}                      -> seg_head (1x1x1 conv)
  seg_outputs.{k<last}                    -> ds_head_{level}

Layout: torch conv [out,in,kz,ky,kx] -> flax [kz,ky,kx,in,out]; torch
transposed conv [in,out,kz,ky,kx] -> flax [kz,ky,kx,in,out]; InstanceNorm3d
(affine, eps 1e-5) -> GroupNorm(group_size=1, eps 1e-5) scale/bias.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

__all__ = ["convert_nnunet_statedict", "load_nnunet_checkpoint"]


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32)
    out = {"kernel": np.transpose(w, (2, 3, 4, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    else:
        out["bias"] = np.zeros(w.shape[0], dtype=np.float32)
    return out


def _tconv(sd, key):
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32)
    # flax ConvTranspose applies the kernel in correlation orientation;
    # torch's transposed conv is the conv gradient — flip the spatial dims
    out = {"kernel": np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1)).copy()}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    else:
        out["bias"] = np.zeros(w.shape[1], dtype=np.float32)
    return out


def _norm(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"], dtype=np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], dtype=np.float32),
    }


def _stage(sd, prefixes) -> Dict:
    """Two (conv, instnorm) blocks -> one StageBlock's params."""
    blocks = {}
    for j, prefix in enumerate(prefixes):
        blocks[f"ConvBlock_{j}"] = {
            "Conv_0": _conv(sd, f"{prefix}.conv"),
            "GroupNorm_0": _norm(sd, f"{prefix}.instnorm"),
        }
    return blocks


def convert_nnunet_statedict(state_dict, n_stages: int) -> Dict:
    """Convert a Generic_UNet ``state_dict`` (numpy-convertible values) into
    the param pytree of ``UNet3D(features=..., deep_supervision=True)`` with
    ``len(features) == n_stages``.

    The caller instantiates ``UNet3D`` with the matching features/strides
    (from the nnU-Net plans file); this function only relayouts weights.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {}

    # encoder: stages 0..n-2 are conv_blocks_context.{i}.blocks.{0,1};
    # the bottleneck (stage n-1) is .{last}.{0,1}.blocks.0
    for i in range(n_stages - 1):
        params[f"StageBlock_{i}"] = _stage(
            sd, [f"conv_blocks_context.{i}.blocks.{j}" for j in (0, 1)]
        )
    last = n_stages - 1
    params[f"StageBlock_{last}"] = _stage(
        sd, [f"conv_blocks_context.{last}.{j}.blocks.0" for j in (0, 1)]
    )

    # decoder: tu.{k} + conv_blocks_localization.{k}.{0,1}.blocks.0
    n_dec = n_stages - 1
    for k in range(n_dec):
        params[f"ConvTranspose_{k}"] = _tconv(sd, f"tu.{k}")
        params[f"StageBlock_{n_stages + k}"] = _stage(
            sd, [f"conv_blocks_localization.{k}.{j}.blocks.0" for j in (0, 1)]
        )

    # segmentation heads: nnU-Net orders seg_outputs coarse->fine; the finest
    # is the main head, the rest are deep-supervision heads at decoder levels
    n_heads = len([k for k in sd if k.startswith("seg_outputs.") and k.endswith(".weight")])
    params["seg_head"] = _conv(sd, f"seg_outputs.{n_heads - 1}")
    for h in range(n_heads - 1):
        # seg_outputs.{h} taps decoder output k = h + (n_dec - n_heads + 1);
        # UNet3D names its aux head after the encoder level it sits at
        k = h + (n_dec - (n_heads - 1))
        level = n_dec - 1 - k
        params[f"ds_head_{level + 1}"] = _conv(sd, f"seg_outputs.{h}")

    import jax.numpy as jnp

    return {"params": _to_jnp(params)}


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def load_nnunet_checkpoint(path: str, n_stages: int) -> Dict:
    """Load a ``model_final_checkpoint.model`` (torch pickle) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_nnunet_statedict(sd, n_stages)
