"""Synthetic shape voxelisation (reference: platipy/imaging/generation/image.py:19-137).

Array-space conventions preserved exactly: ``insert_sphere`` indexes the array
with ``np.indices`` so centre/radius are given in array (z,y,x-ish) order as in
the reference, and the image variants convert physical mm to voxels the same
way (including the reversed-spacing quirks at image.py:99,127).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image

__all__ = [
    "insert_sphere",
    "insert_cylinder",
    "insert_sphere_image",
    "insert_cylinder_image",
]


def insert_sphere(arr, sp_radius=4, sp_centre=(0, 0, 0)):
    """Insert a sphere (value 1) into an array."""
    arr_copy = np.array(arr, copy=True)
    x, y, z = np.indices(arr.shape)

    if not hasattr(sp_radius, "__iter__"):
        sp_radius = [sp_radius] * 3
    sp_radius_x, sp_radius_y, sp_radius_z = sp_radius

    arr_copy[
        ((x - sp_centre[0]) / sp_radius_x) ** 2.0
        + ((y - sp_centre[1]) / sp_radius_y) ** 2.0
        + ((z - sp_centre[2]) / sp_radius_z) ** 2.0
        <= 1
    ] = 1
    return arr_copy


def insert_cylinder(arr, cyl_radius=4, cyl_height=2, cyl_centre=(0, 0, 0)):
    """Insert a cylinder (value 1); vertical extent +/- 0.5*height."""
    arr_copy = np.array(arr, copy=True)
    x, y, z = np.indices(arr.shape)

    if not hasattr(cyl_radius, "__iter__"):
        cyl_radius = [cyl_radius] * 2

    condition_radial = (
        ((z - cyl_centre[0]) / cyl_radius[0]) ** 2
        + ((y - cyl_centre[1]) / cyl_radius[1]) ** 2
    ) <= 1
    condition_height = np.abs((x - cyl_centre[2]) / (0.5 * cyl_height)) <= 1

    arr_copy[condition_radial & condition_height] = 1
    return arr_copy


def insert_sphere_image(image: Image, sp_radius, sp_centre) -> Image:
    """Insert a sphere into an image; radius in mm (converted per axis)."""
    if not hasattr(sp_radius, "__iter__"):
        sp_radius = [sp_radius] * 3

    sp_radius_image = [i / j for i, j in zip(sp_radius, image.spacing_zyx)]
    arr = np.asarray(image.array)
    arr = insert_sphere(arr, sp_radius_image, sp_centre)
    return image.with_array(jnp.asarray(arr))


def insert_cylinder_image(image: Image, cyl_radius=(5, 5), cyl_height=10,
                          cyl_centre=(0, 0, 0)) -> Image:
    """Insert a cylinder into an image; radius/height in mm."""
    if not hasattr(cyl_radius, "__iter__"):
        cyl_radius = [cyl_radius] * 2

    # reference image.py:127: radius scaled by spacing[1::-1] = (y, x)
    cyl_radius_image = [i / j for i, j in zip(cyl_radius, image.spacing[1::-1])]
    cyl_height_image = cyl_height / image.spacing[2]

    arr = np.asarray(image.array)
    arr = insert_cylinder(arr, cyl_radius_image, cyl_height_image, cyl_centre)
    return image.with_array(jnp.asarray(arr))
