"""Geometric cardiac valve generation (reference: platipy/imaging/utils/valve.py:28-180)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.core.interp import INTERP_NEAREST
from platipy_tpu.core.morphology import binary_closing, binary_dilate
from platipy_tpu.generation.image import insert_cylinder_image
from platipy_tpu.label.utils import get_com
from platipy_tpu.utils.crop import crop_to_roi, label_to_roi, paste
from platipy_tpu.utils.geometry import rotate_image, vector_angle

__all__ = ["generate_valve_from_great_vessel", "generate_valve_using_cylinder"]


def generate_valve_from_great_vessel(
    label_great_vessel: Image,
    label_ventricle: Image,
    valve_thickness_mm: float = 8,
) -> Image:
    """Aortic/pulmonic valve: dilated-ventricle ∩ great-vessel overlap + closing
    (reference valve.py:28-82)."""
    template_img = label_ventricle.with_array(
        jnp.zeros(label_ventricle.spatial_shape, jnp.uint8)
    )
    union = label_ventricle.with_array(
        ((label_great_vessel.array > 0) | (label_ventricle.array > 0)).astype(jnp.uint8)
    )
    cb_size, cb_index = label_to_roi(union, expansion_mm=(20, 20, 20))

    label_ventricle = crop_to_roi(label_ventricle, cb_size, cb_index)
    label_great_vessel = crop_to_roi(label_great_vessel, cb_size, cb_index)

    _, _, res_z = label_ventricle.spacing
    valve_thickness = int(valve_thickness_mm / res_z)

    label_ventricle_dilate = binary_dilate(label_ventricle, (valve_thickness,) * 3)

    overlap = (label_great_vessel.array > 0) & (label_ventricle_dilate.array > 0)
    mask = (label_great_vessel.array > 0) | (label_ventricle_dilate.array > 0)
    overlap = overlap & mask

    label_valve = binary_closing(label_ventricle.with_array(overlap.astype(jnp.uint8)))

    return paste(template_img, label_valve, label_valve.size, (0, 0, 0), cb_index)


def generate_valve_using_cylinder(
    label_atrium: Image,
    label_ventricle: Image,
    radius_mm: float = 15,
    height_mm: float = 10,
) -> Image:
    """Mitral/tricuspid valve: oriented cylinder at the chamber interface
    (reference valve.py:85-180)."""
    template_img = label_ventricle.with_array(
        jnp.zeros(label_ventricle.spatial_shape, jnp.uint8)
    )
    union = label_ventricle.with_array(
        ((label_atrium.array > 0) | (label_ventricle.array > 0)).astype(jnp.uint8)
    )
    cb_size, cb_index = label_to_roi(union, expansion_mm=(20, 20, 20))

    label_atrium = crop_to_roi(label_atrium, cb_size, cb_index)
    label_ventricle = crop_to_roi(label_ventricle, cb_size, cb_index)

    # adaptive dilation until the inter-chamber overlap reaches 2000 mm^3
    dilation = 1
    overlap_vol = 0.0
    voxel_vol = float(np.prod(label_ventricle.spacing))
    overlap = None
    while overlap_vol <= 2000:
        dilation_img = [int(dilation / i) for i in label_ventricle.spacing]
        atrium_dil = binary_dilate(label_atrium, dilation_img)
        ventricle_dil = binary_dilate(label_ventricle, dilation_img)
        overlap_arr = (np.asarray(atrium_dil.array) > 0) & (
            np.asarray(ventricle_dil.array) > 0
        )
        overlap = label_ventricle.with_array(jnp.asarray(overlap_arr.astype(np.uint8)))
        overlap_vol = float(overlap_arr.sum() * voxel_vol)
        dilation += 1
        if dilation > 50:
            break

    valve_loc = get_com(overlap, as_int=True)
    valve_loc_real = get_com(overlap, real_coords=True)

    cylinder = insert_cylinder_image(
        template_img_like(label_ventricle), radius_mm, height_mm, valve_loc[::-1]
    )

    orientation_vector = np.array(get_com(label_ventricle, real_coords=True)) - np.array(
        get_com(label_atrium, real_coords=True)
    )

    rotation_angle = vector_angle(orientation_vector, (0, 0, 1), smallest=False)
    rotation_axis = np.cross(orientation_vector, (0, 0, 1))

    label_valve = rotate_image(
        cylinder,
        rotation_centre=valve_loc_real,
        rotation_axis=rotation_axis,
        rotation_angle_radians=rotation_angle,
        interpolation=INTERP_NEAREST,
        default_value=0,
    )

    return paste(template_img, label_valve, label_valve.size, (0, 0, 0), cb_index)


def template_img_like(image: Image) -> Image:
    return image.with_array(jnp.zeros(image.spatial_shape, jnp.uint8))
