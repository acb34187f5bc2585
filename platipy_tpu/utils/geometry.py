"""Geometry helpers (reference: platipy/imaging/utils/geometry.py:19-79)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.core.interp import INTERP_NEAREST
from platipy_tpu.core.resample import resample
from platipy_tpu.core.transform import VersorRigid3DTransform

__all__ = ["vector_angle", "rotate_image"]


def vector_angle(v1, v2, smallest: bool = True) -> float:
    """Angle between two vectors, radians."""
    v1 = np.array(v1, dtype=np.float64)
    v2 = np.array(v2, dtype=np.float64)
    v1_norm = v1 / np.linalg.norm(v1)
    v2_norm = v2 / np.linalg.norm(v2)
    dot_product = np.dot(v1_norm, v2_norm)
    if smallest:
        dot_product = np.abs(dot_product)
    return float(np.arccos(np.clip(dot_product, -1.0, 1.0)))


def rotate_image(
    img: Image,
    rotation_centre=(0, 0, 0),
    rotation_axis=(1, 0, 0),
    rotation_angle_radians: float = 0,
    interpolation=INTERP_NEAREST,
    default_value=0,
) -> Image:
    """Rotate about an axis through a physical centre, resampled in place."""
    axis = np.asarray(rotation_axis, dtype=np.float64)
    norm = np.linalg.norm(axis)
    if norm == 0:
        return img
    axis = axis / norm
    # versor (vector part) for the rotation
    versor = axis * np.sin(rotation_angle_radians / 2.0)
    transform = VersorRigid3DTransform(
        versor=jnp.asarray(versor, jnp.float32),
        translation=jnp.zeros(3),
        center=jnp.asarray(rotation_centre, jnp.float32),
    )
    return resample(
        img, img, transform, interp=interpolation, default_value=default_value,
        output_dtype=img.array.dtype,
    )
