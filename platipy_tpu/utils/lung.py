"""Lung / air-hole segmentation helpers
(reference: platipy/imaging/utils/lung.py:18-152)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.components import (
    connected_components,
    label_shape_statistics,
    relabel_components,
)
from platipy_tpu.core.image import Image
from platipy_tpu.core.morphology import binary_closing, binary_dilate

__all__ = ["detect_holes", "get_external_mask", "get_lung_mask", "fill_holes"]


def detect_holes(img: Image, lower_threshold=-10000, upper_threshold=-400):
    """Detect all (air) holes; returns (label_image, labels sorted by size)."""
    holes = img.with_array(
        ((img.array >= lower_threshold) & (img.array <= upper_threshold)).astype(jnp.uint8)
    )
    label_image = connected_components(holes, connectivity=26)
    # relabel for stable consecutive ids (largest first)
    label_image = relabel_components(label_image)

    labels = []
    lab_np = np.asarray(label_image.array)
    for region in range(1, int(lab_np.max()) + 1):
        stats = label_shape_statistics(label_image, label=region)
        labels.append(
            {
                "label": region,
                "phys_size": stats.get("physical_size", 0.0),
                "elongation": stats.get("elongation", 1.0),
                "roundness": stats.get("roundness", 1.0),
                "perimeter": stats.get("perimeter", 0.0),
                "flatness": stats.get("flatness", 1.0),
            }
        )

    labels = sorted(labels, key=lambda i: i["phys_size"], reverse=True)
    return label_image, labels


def get_external_mask(label_image: Image, labels, kernel_radius: int = 5):
    """Largest air region closed -> external contour (reference lung.py:65-85)."""
    lab = labels[0]["label"]
    external_mask = label_image.with_array(
        (label_image.array == lab).astype(jnp.uint8)
    )
    return binary_closing(external_mask, (kernel_radius,) * 3)


def get_lung_mask(label_image: Image, labels, kernel_radius: int = 2):
    """First non-flat region after the external -> lungs (reference lung.py:88-118)."""
    lung_idx = 1
    while labels[lung_idx]["flatness"] > 2:
        lung_idx += 1
        if lung_idx >= len(labels):
            print("Flatness not satisfied!")
            return None

    lab = labels[lung_idx]["label"]
    lung_mask = label_image.with_array((label_image.array == lab).astype(jnp.uint8))
    return binary_closing(lung_mask, (kernel_radius,) * 3)


def fill_holes(img: Image, label_image: Image, external_mask: Image, lung_mask: Image,
               fill_value=50):
    """Fill all holes except the external/lung regions (reference lung.py:121-152)."""
    img_array = np.asarray(img.array).copy()

    mask = (np.asarray(label_image.array) >= 1).astype(np.int32)
    mask = mask - (np.asarray(external_mask.array) > 0).astype(np.int32)
    mask = mask - (np.asarray(lung_mask.array) > 0).astype(np.int32)
    mask = (mask > 0).astype(np.uint8)
    mask = np.asarray(binary_dilate(jnp.asarray(mask), (3, 3, 3))) > 0

    img_array[mask] = fill_value
    return img.with_array(jnp.asarray(img_array))
