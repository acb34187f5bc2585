"""Registration utilities — drop-in API mirror of
platipy/imaging/registration/utils.py (reference lines 22-344).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core import filters as _filters
from platipy_tpu.core.distance import signed_maurer_distance_map
from platipy_tpu.core.image import Image
from platipy_tpu.core.interp import INTERP_LINEAR, INTERP_NEAREST
from platipy_tpu.core.morphology import binary_dilate
from platipy_tpu.core.resample import resample
from platipy_tpu.core.transform import Transform

logger = logging.getLogger(__name__)

__all__ = [
    "apply_transform",
    "apply_linear_transform",
    "apply_deformable_transform",
    "smooth_and_resample",
    "convert_mask_to_distance_map",
    "convert_mask_to_reg_structure",
    "convert_masks_to_reg_structures",
    "control_point_spacing_distance_to_number",
    "registration_command_iteration",
    "deformable_registration_command_iteration",
    "stage_iteration",
]


def registration_command_iteration(iteration: int, metric_value: float):
    """Per-iteration metric print (reference utils.py:22-27)."""
    print("{0:3} = {1:10.5f}".format(iteration, metric_value))


def deformable_registration_command_iteration(iteration: int, metric_value: float):
    print("{0:3} = {1:10.5f}".format(iteration, metric_value))


def stage_iteration(n_parameters: int):
    """Stage-change print (reference utils.py:30-34; takes the parameter
    count directly instead of an ITK method handle)."""
    print(f"Number of parameters = {n_parameters}")


def control_point_spacing_distance_to_number(image: Image, grid_spacing):
    """Convert control-point grid spacing (mm) to mesh size (reference utils.py:44-51)."""
    image_spacing = np.array(image.spacing)
    image_size = np.array(image.size)
    number_points = image_size * image_spacing / np.array(grid_spacing)
    return (number_points + 0.5).astype(int)


def apply_linear_transform(
    input_image: Image,
    reference_image: Image,
    transform: Transform,
    is_structure: bool = False,
    default_value=0,
    interpolator=INTERP_NEAREST,
) -> Image:
    if is_structure:
        default_value = 0
        interpolator = INTERP_NEAREST
    return apply_transform(
        input_image=input_image,
        reference_image=reference_image,
        transform=transform,
        default_value=default_value,
        interpolator=interpolator,
    )


def apply_deformable_transform(
    input_image: Image,
    transform: Transform,
    is_structure: bool = False,
    default_value=0,
    interpolator=INTERP_NEAREST,
) -> Image:
    if is_structure:
        default_value = 0
        interpolator = INTERP_NEAREST
    return apply_transform(
        input_image=input_image,
        reference_image=None,
        transform=transform,
        default_value=default_value,
        interpolator=interpolator,
    )


def apply_transform(
    input_image: Image,
    reference_image: Optional[Image] = None,
    transform: Optional[Transform] = None,
    default_value=0,
    interpolator=INTERP_NEAREST,
) -> Image:
    """Resample into the reference space through a transform, preserving the
    input dtype (reference utils.py:148-192)."""
    return resample(
        input_image,
        reference=reference_image if reference_image is not None else input_image,
        transform=transform,
        interp=interpolator,
        default_value=default_value,
        output_dtype=input_image.array.dtype,
    )


def smooth_and_resample(
    image: Image,
    isotropic_voxel_size_mm=None,
    shrink_factor=None,
    smoothing_sigma=None,
    interpolator=INTERP_LINEAR,
) -> Image:
    """Gaussian smooth + grid resample, exact reference semantics
    (utils.py:195-267): variance-specified DiscreteGaussian with the reference's
    kernel-width cap, new size ``int(sz/sf + 0.5)``, new spacing
    ``(n_o - 1) * s_o / (n_n - 1)``, same origin/direction.
    """
    if smoothing_sigma:
        if hasattr(smoothing_sigma, "__iter__"):
            smoothing_variance = [i * i for i in smoothing_sigma]
        else:
            smoothing_variance = (smoothing_sigma**2,) * 3

        maximum_kernel_width = int(
            max([8 * j * i for i, j in zip(image.spacing, smoothing_variance)])
        )
        image = _filters.discrete_gaussian(
            image, smoothing_variance, maximum_kernel_width=max(maximum_kernel_width, 2)
        )

    original_spacing = image.spacing
    original_size = image.size

    if shrink_factor and isotropic_voxel_size_mm:
        raise AttributeError(
            "Function must be called with either isotropic_voxel_size_mm or "
            "shrink_factor, not both."
        )
    elif isotropic_voxel_size_mm:
        scale_factor = (
            isotropic_voxel_size_mm * np.ones(3) / np.array(image.spacing)
        )
        new_size = [int(sz / float(sf) + 0.5) for sz, sf in zip(original_size, scale_factor)]
    elif shrink_factor:
        if isinstance(shrink_factor, (list, tuple)):
            new_size = [int(sz / float(sf) + 0.5) for sz, sf in zip(original_size, shrink_factor)]
        else:
            new_size = [int(sz / float(shrink_factor) + 0.5) for sz in original_size]
    else:
        return image

    # reference formula (registration/utils.py:252-255); clamp the new size to
    # >= 2 so aggressive shrink factors on small (cropped) volumes cannot
    # produce a 1-voxel axis and a zero denominator
    new_size = [max(int(s), 2) for s in new_size]
    new_spacing = [
        ((size_o_i - 1) * spacing_o_i) / (size_n_i - 1)
        for size_o_i, spacing_o_i, size_n_i in zip(original_size, original_spacing, new_size)
    ]

    nx, ny, nz = new_size
    reference = Image(
        jnp.zeros((nz, ny, nx), dtype=image.array.dtype),
        image.origin,
        tuple(new_spacing),
        image.direction,
    )
    return resample(
        image,
        reference=reference,
        transform=None,
        interp=interpolator,
        default_value=0.0,
        output_dtype=image.array.dtype,
    )


def convert_mask_to_distance_map(
    mask: Image, squared_distance: bool = False, normalise: bool = False
) -> Image:
    """Signed distance map, inside positive (reference utils.py:270-299)."""
    # two-valued masks (the common case) settle the multi-value check with
    # scalar device reductions instead of pulling the volume for np.unique —
    # a fractional/smoothed mask (many unique values) still takes the
    # reference's median-cutoff path
    arr_max = float(jnp.max(mask.array))
    two_valued = bool(jnp.all((mask.array == 0) | (mask.array == arr_max)))
    if not two_valued:
        arr = np.asarray(mask.array)
        vals = np.unique(arr[arr > 0])
        if len(vals) > 2:
            cutoff = np.median(vals)
            mask = mask.with_array(
                ((mask.array >= cutoff) & (mask.array <= float(vals.max()))).astype(jnp.uint8)
            )

    raw_map = signed_maurer_distance_map(
        mask,
        inside_is_positive=True,
        squared_distance=squared_distance,
        use_image_spacing=True,
    )

    if normalise:
        return raw_map.with_array(raw_map.array / float(jnp.max(raw_map.array)))
    return raw_map


def convert_masks_to_reg_structures(masks, expansion=(0, 0, 0)):
    """Batch form of :func:`convert_mask_to_reg_structure` for N masks.

    The per-mask form pays three blocking scalar fetches each (two-valued
    gate + normalisation max) — ~0.1-0.4 s apiece over a remote-device link.
    Here every device op dispatches first and the scalars cross the link in
    ONE stacked fetch; a mask that turns out to be many-valued falls back to
    the single-mask path for the reference's median-cutoff handling.
    """
    masks = list(masks)
    gate_scalars = jnp.stack([
        jnp.stack([
            jnp.max(m.array).astype(jnp.float32),
            jnp.all((m.array == 0) | (m.array == jnp.max(m.array))).astype(jnp.float32),
        ])
        for m in masks
    ])
    gate = np.asarray(gate_scalars)              # one fetch for all gates

    out = [None] * len(masks)
    pending = []
    for i, m in enumerate(masks):
        if gate[i, 1] < 0.5:                     # many-valued: rare, exact path
            out[i] = convert_mask_to_reg_structure(m, expansion=expansion)
        else:
            exp = expansion
            if not hasattr(exp, "__iter__"):
                exp = [int(exp / sp) for sp in m.spacing]
            mm = binary_dilate(m, radius=exp) if any(exp) else m
            dm = convert_mask_to_distance_map(mm, squared_distance=False)
            masked = jnp.where(mm.array > 0, dm.array, 0.0)
            pending.append((i, mm, masked))

    if pending:
        maxes = np.asarray(jnp.stack(
            [jnp.max(p[2]) for p in pending]
        ))                                       # one fetch for all maxima
        for (i, mm, masked), mx in zip(pending, maxes):
            mx = float(mx) if mx > 0 else 1.0
            out[i] = mm.with_array((masked / mx).astype(jnp.float32))
    return out


def convert_mask_to_reg_structure(mask: Image, expansion=(0, 0, 0), scale=lambda x: x) -> Image:
    """Normalised interior distance map for structure-guided DIR
    (reference utils.py:302-344)."""
    # two-valued masks (the common case) settle the multi-value check with
    # scalar device reductions instead of pulling the volume for np.unique —
    # a fractional/smoothed mask (many unique values) still takes the
    # reference's median-cutoff path
    arr_max = float(jnp.max(mask.array))
    two_valued = bool(jnp.all((mask.array == 0) | (mask.array == arr_max)))
    if not two_valued:
        arr = np.asarray(mask.array)
        vals = np.unique(arr[arr > 0])
        if len(vals) > 2:
            cutoff = np.median(vals)
            mask = mask.with_array(
                ((mask.array >= cutoff) & (mask.array <= float(vals.max()))).astype(jnp.uint8)
            )

    if not hasattr(expansion, "__iter__"):
        expansion = [int(expansion / i) for i in mask.spacing]
    if any(expansion):
        mask = binary_dilate(mask, radius=expansion)

    distance_map = convert_mask_to_distance_map(mask, squared_distance=False)
    masked = jnp.where(mask.array > 0, distance_map.array, 0.0)
    # scalar fetch — np.asarray(masked).max() pulled the full volume over the
    # device link just to read one number
    max_val = float(jnp.max(masked))
    if max_val <= 0:
        max_val = 1.0
    scaled = masked / max_val
    out = mask.with_array(scaled.astype(jnp.float32))
    return scale(out)
