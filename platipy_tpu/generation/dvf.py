"""Synthetic deformation vector field generation
(reference: platipy/imaging/generation/dvf.py:29-415).

All field construction is array math on device; "realistic" fields reuse the
demons engine between distance-map registration structures.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.filters import smoothing_recursive_gaussian
from platipy_tpu.core.image import Image
from platipy_tpu.core.interp import INTERP_LINEAR, INTERP_NEAREST
from platipy_tpu.core.morphology import binary_dilate, binary_erode
from platipy_tpu.core.resample import warp_image
from platipy_tpu.core.transform import DisplacementFieldTransform
from platipy_tpu.registration.deformable import fast_symmetric_forces_demons_registration
from platipy_tpu.registration.utils import convert_mask_to_reg_structure

__all__ = [
    "generate_field_shift",
    "generate_field_asymmetric_contract",
    "generate_field_asymmetric_extend",
    "generate_field_expand",
    "generate_field_radial_bend",
]


def _smooth_field(dvf: Image, gaussian_smooth) -> Image:
    if np.any(gaussian_smooth):
        if not hasattr(gaussian_smooth, "__iter__"):
            gaussian_smooth = (gaussian_smooth,) * 3
        dvf = smoothing_recursive_gaussian(dvf, gaussian_smooth)
    return dvf


def _apply_dvf_nn(mask: Image, dvf: Image) -> Image:
    out = warp_image(mask.astype(jnp.float32), dvf, reference=mask,
                     interp=INTERP_NEAREST, default_value=0.0)
    return mask.with_array(jnp.rint(out.array).astype(mask.array.dtype))


def generate_field_shift(mask_image: Image, vector_shift=(10, 10, 10), gaussian_smooth=5):
    """Shift a structure; vector in (z,y,x) mm like the reference (dvf.py:29-81).

    Returns (shifted_mask, DisplacementFieldTransform, dvf Image).
    """
    shape = mask_image.spatial_shape
    # reference stores -vector_shift[::-1] as (x,y,z) components
    vec_xyz = -np.asarray(vector_shift, dtype=np.float32)[::-1]
    dvf_arr = jnp.broadcast_to(
        jnp.asarray(vec_xyz, jnp.float32), shape + (3,)
    )
    dvf_template = mask_image.with_array(dvf_arr)

    mask_image_shift = _apply_dvf_nn(mask_image, dvf_template)

    union = (mask_image.array > 0) | (mask_image_shift.array > 0)
    dvf_template = dvf_template.with_array(
        jnp.where(union[..., None], dvf_template.array, 0.0)
    )

    dvf_template = _smooth_field(dvf_template, gaussian_smooth)
    dvf_tfm = DisplacementFieldTransform(dvf_template)
    mask_image_shift = _apply_dvf_nn(mask_image, dvf_template)

    return mask_image_shift, dvf_tfm, dvf_template


def generate_field_asymmetric_contract(
    mask_image: Image, vector_asymmetric_contract=(10, 10, 10), gaussian_smooth=5,
    compute_real_dvf=False,
):
    """Contract a structure border (reference dvf.py:84-156)."""
    shape = mask_image.spatial_shape
    vec_xyz = np.asarray(vector_asymmetric_contract, dtype=np.float32)[::-1]
    dvf_arr = jnp.broadcast_to(jnp.asarray(vec_xyz, jnp.float32), shape + (3,))
    dvf_arr = jnp.where((mask_image.array > 0)[..., None], dvf_arr, 0.0)
    dvf_template = mask_image.with_array(dvf_arr)

    mask_contract = _apply_dvf_nn(mask_image, dvf_template)

    if compute_real_dvf:
        reg_struct = convert_mask_to_reg_structure(mask_image, expansion=3)
        reg_struct_def = convert_mask_to_reg_structure(mask_contract, expansion=3)
        _, _, dvf_template = fast_symmetric_forces_demons_registration(
            reg_struct_def,
            reg_struct,
            isotropic_resample=True,
            resolution_staging=[4, 2],
            iteration_staging=[20, 10],
        )

    dvf_template = _smooth_field(dvf_template, gaussian_smooth)
    dvf_tfm = DisplacementFieldTransform(dvf_template)
    mask_contract = _apply_dvf_nn(mask_image, dvf_template)

    return mask_contract, dvf_tfm, dvf_template


def generate_field_asymmetric_extend(
    mask_image: Image, vector_asymmetric_extend=(10, 10, 10), gaussian_smooth=5
):
    """Extend a structure border (reference dvf.py:159-216)."""
    shape = mask_image.spatial_shape
    vec_xyz = -np.asarray(vector_asymmetric_extend, dtype=np.float32)[::-1]
    dvf_arr = jnp.broadcast_to(jnp.asarray(vec_xyz, jnp.float32), shape + (3,))
    dvf_template = mask_image.with_array(dvf_arr)

    mask_extend = _apply_dvf_nn(mask_image, dvf_template)

    dvf_template = dvf_template.with_array(
        jnp.where((mask_extend.array > 0)[..., None], dvf_template.array, 0.0)
    )

    dvf_template = _smooth_field(dvf_template, gaussian_smooth)
    dvf_tfm = DisplacementFieldTransform(dvf_template)
    mask_extend = _apply_dvf_nn(mask_image, dvf_template)

    return mask_extend, dvf_tfm, dvf_template


def generate_field_expand(
    mask: Image,
    bone_mask=False,
    expand=3,
    gaussian_smooth=5,
    use_internal_deformation=True,
):
    """Expand/shrink a structure; realistic field from demons between
    registration structures (reference dvf.py:219-324)."""
    if bone_mask is not False:
        mask_original = mask.with_array(
            ((mask.array > 0) | (bone_mask.array > 0)).astype(mask.array.dtype)
        )
    else:
        mask_original = mask

    if not hasattr(expand, "__iter__"):
        expand = (expand,) * 3
    expand = np.array(expand, dtype=np.float64)
    # reference: expand given in (z,y,x) mm -> voxels -> reorder to (x,y,z)
    expand = expand / np.array(mask.spacing_zyx)
    expand = expand[::-1]

    if np.all(expand <= 0):
        mask_expand = binary_erode(mask, np.abs(expand).astype(int).tolist())
    elif np.all(expand >= 0):
        mask_expand = binary_dilate(mask, np.abs(expand).astype(int).tolist())
    else:
        expansion_kernel = expand * (expand > 0)
        shrink_kernel = expand * (expand < 0)
        mask_expand = binary_dilate(mask, np.abs(expansion_kernel).astype(int).tolist())
        mask_expand = binary_erode(mask_expand, np.abs(shrink_kernel).astype(int).tolist())

    if bone_mask is not False:
        mask_expand = mask_expand.with_array(
            ((mask_expand.array > 0) | (bone_mask.array > 0)).astype(jnp.uint8)
        )

    if use_internal_deformation:
        registration_mask_original = convert_mask_to_reg_structure(mask_original)
        registration_mask_expand = convert_mask_to_reg_structure(mask_expand)
    else:
        registration_mask_original = mask_original.astype(jnp.float32)
        registration_mask_expand = mask_expand.astype(jnp.float32)

    _, _, dvf_template = fast_symmetric_forces_demons_registration(
        registration_mask_expand,
        registration_mask_original,
        isotropic_resample=True,
        resolution_staging=[4, 2],
        iteration_staging=[10, 10],
    )

    dvf_template = _smooth_field(dvf_template, gaussian_smooth)
    dvf_tfm = DisplacementFieldTransform(dvf_template)
    mask_symmetric_expand = _apply_dvf_nn(mask, dvf_template)

    return mask_symmetric_expand, dvf_tfm, dvf_template


def generate_field_radial_bend(
    reference_image: Image,
    body_mask: Image,
    reference_point,
    axis_of_rotation=(0, 0, -1),
    scale=0.1,
    mask_bend_from_reference_point=("z", "inf"),
    gaussian_smooth=5,
):
    """Radial bending field about an axis (reference dvf.py:327-415).

    ``reference_point`` and ``axis_of_rotation`` in (z,y,x) like the reference.
    """
    body_mask_arr = np.asarray(body_mask.array).copy()

    if mask_bend_from_reference_point is not False:
        axis_name, side = mask_bend_from_reference_point
        if axis_name == "z":
            if side == "inf":
                body_mask_arr[: reference_point[0], :, :] = 0
            elif side == "sup":
                body_mask_arr[reference_point[0] :, :, :] = 0
        if axis_name == "y":
            if side == "post":
                body_mask_arr[:, reference_point[1] :, :] = 0
            elif side == "ant":
                body_mask_arr[:, : reference_point[1], :] = 0
        if axis_name == "x":
            if side == "left":
                body_mask_arr[:, :, reference_point[2] :] = 0
            elif side == "right":
                body_mask_arr[:, :, : reference_point[2]] = 0

    pt_arr = np.array(np.where(body_mask_arr))
    vector_ref_to_pt = pt_arr - np.array(reference_point)[:, None]

    axis_of_rotation = np.array(axis_of_rotation, dtype=np.float64)
    axis_of_rotation = axis_of_rotation / np.linalg.norm(axis_of_rotation)

    deformation_vectors = np.cross(vector_ref_to_pt[::-1].T, axis_of_rotation[::-1])

    dvf_template_arr = np.zeros(reference_image.spatial_shape + (3,), dtype=np.float32)
    if scale is not False:
        dvf_template_arr[np.where(body_mask_arr)] = deformation_vectors * scale

    dvf_template = reference_image.with_array(jnp.asarray(dvf_template_arr))
    dvf_template = _smooth_field(dvf_template, gaussian_smooth)
    dvf_tfm = DisplacementFieldTransform(dvf_template)

    default = float(np.asarray(reference_image.array).min())
    reference_image_bend = warp_image(
        reference_image.astype(jnp.float32), dvf_template, reference=reference_image,
        interp=INTERP_LINEAR, default_value=int(default),
    )
    reference_image_bend = reference_image_bend.astype(reference_image.array.dtype)

    return reference_image_bend, dvf_tfm, dvf_template
