"""Deformable registration: fast symmetric-forces demons + multiscale driver.

TPU-native rebuild of the reference's compute core
(/root/reference/platipy/imaging/registration/deformable.py:31-306).  The ITK
filter iterated a C++ voxel sweep per demons iteration; here each pyramid level
is ONE jit-compiled XLA program: a ``fori_loop`` whose body fuses

    warp(moving, field) -> symmetric ESM force -> update-field Gaussian ->
    additive field update -> displacement-field Gaussian

entirely on device (HBM-bandwidth bound: ~1 warp gather + 2 separable smooths
per iteration).  The per-level program is shape-static, so it vmaps across an
atlas axis and shard_maps across an ICI mesh unchanged — that is the "DP" of
the multi-atlas pipeline.

Semantics matched to the reference:

* additive update rule (FastSymmetricForces filter), symmetric gradient force
  ``u = (f-m)(∇f+∇m)/2 / (‖(∇f+∇m)/2‖² + (f-m)²/K)``, K normalised so the
  per-iteration step is capped at ``max_step_vox`` voxels (ITK default 0.5);
* smooth-update-field (σ=1 vox) and smooth-displacement-field
  (``regularisation_kernel_mm`` / full-res spacing, in voxels) both on, as set
  at reference deformable.py:244-257;
* the multiscale driver reproduces deformable.py:130-159 exactly: resample
  running DVF to the level grid, pre-warp moving, run demons from a ZERO level
  field, compose ``dvf_total += Resample(dvf_iter, tfm_total)``, then smooth
  the total with the (numerically voxel-valued) sigmas — including the
  reference's quirk of feeding voxel-unit sigmas to a physical-unit smoother.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core import filters as _filters
from platipy_tpu.core.image import Image
from platipy_tpu.core.interp import INTERP_LINEAR
from platipy_tpu.core.resample import (
    identity_dvf,
    resample,
    transform_to_displacement_field,
    warp_image,
)
from platipy_tpu.core.transform import DisplacementFieldTransform, Transform
from platipy_tpu.registration.utils import smooth_and_resample

__all__ = [
    "bspline_registration",
    "compose_displacement_fields",
    "demons_level",
    "multiscale_demons",
    "fast_symmetric_forces_demons_registration",
]


def compose_displacement_fields(dvf_total: Image, dvf_iter: Image) -> Image:
    """Compose a per-level increment ONTO a running total field:

        u_new(x) = u_total(x) + u_iter(x + u_total(x))

    i.e. the increment is resampled *through the running transform* before
    accumulation — the reference's exact composition at deformable.py:151-154
    (``dvf_total += Resample(dvf_iter, tfm_total)``).  Both fields live on the
    same grid; [z,y,x,3] physical-mm (x,y,z) components.
    """
    dvf_iter_pulled = warp_image(dvf_iter, dvf_total, reference=dvf_total,
                                 interp=INTERP_LINEAR, default_value=0.0)
    return dvf_total.with_array(dvf_total.array + dvf_iter_pulled.array)


# ---------------------------------------------------------------------------
# single-level demons (one XLA program)
# ---------------------------------------------------------------------------

# Per-iteration field smoothing runs its banded matmuls at DEFAULT precision
# (single-pass bf16, ~5e-3 relative error per smooth).  The error acts as
# sub-percent noise on a field that is re-smoothed every iteration and
# re-estimated at each finer level; end-to-end bench DSC is unchanged
# (0.9947 vs 0.9946 at 3-pass HIGH) for ~19% less smoothing time — the
# dominant demons cost.  One-shot public filters keep "highest" for
# oracle-level parity; on CPU (tests) precision hints are no-ops, so CI
# remains exact.
DEMONS_SMOOTH_PRECISION = "default"


def _vector_smooth(field: jnp.ndarray, kernels_zyx) -> jnp.ndarray:
    """Smooth each (x,y,z) component of a [z,y,x,3] field separably."""
    return _filters.convolve_separable(field, kernels_zyx,
                                       precision=DEMONS_SMOOTH_PRECISION)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations",
        "spacing",
        "std_kernels_key",
        "update_kernels_key",
        "max_step_vox",
        "max_disp_vox",
        "warp_dtype_key",
        "field_dtype_key",
        "max_rms_error",
    ),
)
def _demons_level_impl(
    fixed: jnp.ndarray,
    moving: jnp.ndarray,
    init_field: jnp.ndarray,
    *,
    iterations: int,
    spacing: Tuple[float, float, float],
    std_kernels_key: Tuple[Tuple[float, ...], ...],
    update_kernels_key: Tuple[Tuple[float, ...], ...],
    max_step_vox: float,
    max_disp_vox: Tuple[int, int, int] = (16, 16, 16),
    warp_dtype_key: str = "float32",
    field_dtype_key: str = "float32",
    max_rms_error=None,
):
    spacing_arr = np.asarray(spacing, dtype=np.float64)
    # ITK ESM normaliser: bound of s*J/(|J|^2 + s^2/K) is sqrt(K)/2, so
    # K = 4 (max_step_vox * mean_spacing)^2 caps each update at max_step_vox
    # voxels (ITK MaximumUpdateStepLength default 0.5)
    k_norm = 4.0 * (max_step_vox**2) * float(np.mean(spacing_arr**2))

    std_kernels = [np.asarray(k) for k in std_kernels_key]
    update_kernels = [np.asarray(k) for k in update_kernels_key]

    # optional low-precision STORAGE for the iterated field/update chain
    # (field_dtype_key="bfloat16"): the loop is HBM-bound at the measured
    # stream rate (docs/ROOFLINE.md), so halving the bytes of the field, the
    # update and every smoothing intermediate is the remaining lever —
    # modelled ~28.5 volume-traffics/iteration vs 54.5 all-f32.  The field is
    # re-smoothed every iteration, so bf16 quantisation (~0.4% of a <=10 mm
    # field = ~0.02 mm/iteration) acts as sub-regularisation-scale noise;
    # gated by the bench DSC A/B like the bf16 warp.  f32 keeps exact
    # public-path reproducibility.
    field_dtype = jnp.dtype(field_dtype_key)

    grad_f = _filters.gradient(fixed, spacing).astype(field_dtype)

    nz, ny, nx = fixed.shape
    # warp is index-space here (field in mm, converted with spacing — identity
    # direction within a level, which is how the reference's demons filter also
    # operates); multipass shift-select keeps it VPU-bound (see core/interp.py)
    sx, sy, sz = (float(s) for s in spacing)

    from platipy_tpu.core.interp import warp_multipass

    # optional bf16 per-iteration image warp (the warp reads the moving
    # volume 3x10 taps per iteration and dominates the VPU critical path;
    # bf16 taps halve that traffic at ~0.4% intensity rounding — the ESM
    # force is linear in the intensity difference, so structured-image
    # convergence is unaffected: bench DSC unchanged at 4 decimals).  The
    # public/serial and sharded paths stay f32 for exact reproducibility —
    # on pure-noise images demons is chaotic and any rounding diverges.
    moving_lp = moving.astype(jnp.dtype(warp_dtype_key))

    def warp_by_field(vol, field):
        return warp_multipass(
            vol, field[..., 0] / sx, field[..., 1] / sy, field[..., 2] / sz,
            max_disp_vox=max_disp_vox, default_value=0.0,
        )

    def smoothed_update(field):
        m_w = warp_by_field(moving_lp, field).astype(jnp.float32)
        grad_m = _filters.gradient(m_w, spacing)
        diff = fixed - m_w
        j = 0.5 * (grad_f.astype(jnp.float32) + grad_m)
        j_sq = jnp.sum(j * j, axis=-1)
        denom = j_sq + (diff * diff) / k_norm
        # ITK ESM thresholds: zero the update where the intensity difference
        # is below 1e-3 (kills interpolation-noise amplification in flat
        # regions) or the denominator is degenerate
        valid = (jnp.abs(diff) > 1e-3) & (denom > 1e-9)
        scale = jnp.where(valid, diff / jnp.maximum(denom, 1e-9), 0.0)
        update = (j * scale[..., None]).astype(field_dtype)
        return _vector_smooth(update, update_kernels)

    def body(_, field):
        update = smoothed_update(field)
        field = (field + update).astype(field_dtype)
        field = _vector_smooth(field, std_kernels)
        return field

    init_field = init_field.astype(field_dtype)
    if max_rms_error is None:
        out = jax.lax.fori_loop(0, iterations, body, init_field)
        return out.astype(jnp.float32)

    # ITK PDE-framework convergence (PDEDeformableRegistrationFilter, which
    # the reference's FastSymmetricForcesDemonsRegistrationFilter inherits
    # with MaximumRMSError default 0.99 mm, never overridden at reference
    # deformable.py:244-257): stop the level once the RMS magnitude of the
    # APPLIED update drops below the threshold.  ITK computes RMSChange from
    # the update buffer before the displacement-field smoothing — measuring
    # field_new - field_old instead would fold the regulariser's contraction
    # of the accumulated field into "change" and a tight threshold could
    # then never fire.  ``iterations`` remains the hard cap.
    thresh = jnp.float32(max_rms_error)

    def cond(state):
        i, rms, _ = state
        return (i < iterations) & (rms >= thresh)

    def wbody(state):
        i, _, field = state
        update = smoothed_update(field)
        u32 = update.astype(jnp.float32)
        rms = jnp.sqrt(jnp.mean(jnp.sum(u32 * u32, axis=-1)))
        field = _vector_smooth((field + update).astype(field_dtype), std_kernels)
        return i + 1, rms, field

    _, _, field = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), jnp.float32(jnp.inf), init_field)
    )
    return field.astype(jnp.float32)


def demons_level(
    fixed: Image,
    moving: Image,
    init_field: Optional[Image] = None,
    iterations: int = 10,
    std_devs_vox=(1.0, 1.0, 1.0),
    update_std_vox=(1.0, 1.0, 1.0),
    max_step_vox: float = 0.5,
    smooth_displacement_field: bool = True,
    smooth_update_field: bool = True,
    maximum_rms_error=None,
) -> Image:
    """Run demons at one resolution level; returns the incremental DVF (mm).

    ``maximum_rms_error`` (mm): ITK PDE-framework convergence — stop the
    level once the RMS field change per iteration drops below it (the
    reference's ITK filter inherits this with default 0.99 mm).  None keeps
    the exact fixed trip count."""
    if init_field is None:
        init_field = identity_dvf(fixed)

    def kernels(sigmas_vox, enabled):
        if not enabled:
            return ((1.0,),) * 3
        s = np.asarray(sigmas_vox, dtype=np.float64).reshape(-1)
        if s.size == 1:
            s = np.repeat(s, 3)
        # sigmas are (x,y,z); array axes are (z,y,x)
        ks = [
            _filters.discrete_gaussian_kernel1d(s[2] ** 2, 0.1, 30),
            _filters.discrete_gaussian_kernel1d(s[1] ** 2, 0.1, 30),
            _filters.discrete_gaussian_kernel1d(s[0] ** 2, 0.1, 30),
        ]
        return tuple(tuple(float(v) for v in k) for k in ks)

    # within a level the incremental field starts at zero (the driver pre-warps
    # by the accumulated total), so a tight voxel bound suffices
    max_disp = tuple(
        min(8, n - 1)
        for n in (fixed.spatial_shape[2], fixed.spatial_shape[1], fixed.spatial_shape[0])
    )
    out = _demons_level_impl(
        fixed.array.astype(jnp.float32),
        moving.array.astype(jnp.float32),
        init_field.array.astype(jnp.float32),
        iterations=int(iterations),
        spacing=tuple(float(s) for s in fixed.spacing),
        std_kernels_key=kernels(std_devs_vox, smooth_displacement_field),
        update_kernels_key=kernels(update_std_vox, smooth_update_field),
        max_step_vox=float(max_step_vox),
        max_disp_vox=max_disp,
        max_rms_error=None if maximum_rms_error is None else float(maximum_rms_error),
    )
    return fixed.with_array(out)


# ---------------------------------------------------------------------------
# multiscale driver (reference deformable.py:31-187 semantics)
# ---------------------------------------------------------------------------

def multiscale_demons(
    fixed_image: Image,
    moving_image: Image,
    initial_transform: Optional[Transform] = None,
    initial_displacement_field: Optional[Image] = None,
    isotropic_resample: Optional[bool] = None,
    resolution_staging: Sequence[float] = (8, 4, 1),
    smoothing_sigmas: Sequence[float] = (8, 4, 1),
    iteration_staging: Sequence[int] = (10, 10, 10),
    interp_order=INTERP_LINEAR,
    regularisation_kernel_vox=(1.5, 1.5, 1.5),
    update_std_vox=(1.0, 1.0, 1.0),
    max_step_vox: float = 0.5,
    verbose: bool = False,
    maximum_rms_error=None,
) -> Image:
    """Multi-resolution demons; returns the total DVF on the fixed grid."""
    fixed_images: List[Image] = []
    moving_images: List[Image] = []

    for resolution, smoothing_sigma in zip(resolution_staging, smoothing_sigmas):
        iso_mm, shrink = (resolution, None) if isotropic_resample else (None, resolution)
        fixed_images.append(
            smooth_and_resample(
                fixed_image, isotropic_voxel_size_mm=iso_mm, shrink_factor=shrink,
                smoothing_sigma=smoothing_sigma, interpolator=interp_order,
            )
        )
        moving_images.append(
            smooth_and_resample(
                moving_image, isotropic_voxel_size_mm=iso_mm, shrink_factor=shrink,
                smoothing_sigma=smoothing_sigma, interpolator=interp_order,
            )
        )

    if initial_displacement_field is None:
        if initial_transform is not None:
            dvf_total = transform_to_displacement_field(initial_transform, fixed_image)
        else:
            dvf_total = identity_dvf(fixed_image)
    else:
        dvf_total = resample(initial_displacement_field, fixed_image, None,
                             interp=INTERP_LINEAR, default_value=0.0)

    for i, (f_image, m_image) in enumerate(zip(fixed_images, moving_images)):
        # resample total field to the level grid
        dvf_total = resample(dvf_total, f_image, None, interp=INTERP_LINEAR,
                             default_value=0.0)
        # pre-warp the moving image through the running transform
        m_warped = warp_image(m_image, dvf_total, reference=f_image,
                              interp=interp_order, default_value=0.0)

        dvf_iter = demons_level(
            f_image,
            m_warped,
            iterations=int(iteration_staging[i]),
            std_devs_vox=regularisation_kernel_vox,
            update_std_vox=update_std_vox,
            max_step_vox=max_step_vox,
            maximum_rms_error=maximum_rms_error,
        )

        # compose: dvf_total(x) += dvf_iter(x + dvf_total(x))   [ref :154]
        dvf_total = compose_displacement_fields(dvf_total, dvf_iter)

        # reference quirk: voxel-unit sigmas fed to the physical-unit smoother
        sigma = np.asarray(regularisation_kernel_vox, dtype=np.float64).reshape(-1)
        if sigma.size == 1:
            sigma = np.repeat(sigma, 3)
        dvf_total = _filters.smoothing_recursive_gaussian(dvf_total, sigma)

        if verbose:
            mag = float(np.asarray(jnp.abs(dvf_total.array)).max())
            print(f"level {i}: shape={f_image.spatial_shape} max|dvf|={mag:.3f} mm")

    dvf_total = resample(dvf_total, fixed_image, None, interp=INTERP_LINEAR,
                         default_value=0.0)
    return dvf_total


def fast_symmetric_forces_demons_registration(
    fixed_image: Image,
    moving_image: Image,
    resolution_staging: Sequence[float] = (8, 4, 1),
    iteration_staging: Sequence[int] = (10, 10, 10),
    isotropic_resample: bool = False,
    initial_displacement_field: Optional[Image] = None,
    regularisation_kernel_mm: float = 1.5,
    smoothing_sigma_factor: float = 1,
    smoothing_sigmas=False,
    default_value=None,
    ncores: int = 1,
    interp_order=INTERP_LINEAR,
    verbose: bool = False,
    maximum_rms_error=None,
):
    """Drop-in mirror of reference deformable.py:190-306.

    ``ncores`` is accepted for API compatibility and ignored — XLA owns the
    chip.  Returns (registered_image, DisplacementFieldTransform, dvf).
    """
    moving_dtype = moving_image.array.dtype
    fixed_image = fixed_image.astype(jnp.float32)
    moving_image = moving_image.astype(jnp.float32)

    # regularisation kernel: mm -> voxels of the (full-res) fixed image
    regularisation_kernel_vox = np.array(regularisation_kernel_mm) / np.array(
        fixed_image.spacing
    )

    if not smoothing_sigmas:
        smoothing_sigmas = [i * smoothing_sigma_factor for i in resolution_staging]

    deformation_field = multiscale_demons(
        fixed_image=fixed_image,
        moving_image=moving_image,
        resolution_staging=resolution_staging,
        smoothing_sigmas=smoothing_sigmas,
        iteration_staging=iteration_staging,
        isotropic_resample=isotropic_resample,
        initial_displacement_field=initial_displacement_field,
        interp_order=interp_order,
        regularisation_kernel_vox=tuple(regularisation_kernel_vox.tolist()),
        verbose=verbose,
        maximum_rms_error=maximum_rms_error,
    )

    if default_value is None:
        default_value = 0
        if float(np.asarray(moving_image.array).min()) <= -1000:
            default_value = -1000

    registered_image = warp_image(
        moving_image, deformation_field, reference=fixed_image,
        interp=interp_order, default_value=default_value,
    )
    if not jnp.issubdtype(moving_dtype, jnp.floating):
        registered_image = registered_image.with_array(
            jnp.rint(registered_image.array).astype(moving_dtype)
        )
    else:
        registered_image = registered_image.astype(moving_dtype)

    output_transform = DisplacementFieldTransform(deformation_field)
    return registered_image, output_transform, deformation_field


# ---------------------------------------------------------------------------
# B-spline FFD registration (reference deformable.py:309-547)
# ---------------------------------------------------------------------------

def bspline_registration(
    fixed_image: Image,
    moving_image: Image,
    fixed_structure=False,
    moving_structure=False,
    resolution_staging=(8, 4, 2),
    smooth_sigmas=(4, 2, 1),
    sampling_rate=0.1,
    optimiser="LBFGS",
    metric="mean_squares",
    initial_grid_spacing=64,
    grid_scale_factors=(1, 2, 4),
    interp_order=3,
    default_value=-1000,
    number_of_iterations=20,
    isotropic_resample=False,
    initial_isotropic_size=1,
    number_of_histogram_bins_mi=30,
    verbose=False,
    ncores=8,
):
    """Multi-resolution free-form-deformation registration.

    Drop-in mirror of reference deformable.py:309-547 ("UNDER ACTIVE
    DEVELOPMENT" there too): control-point mesh from mm spacing, per-level
    grid refinement by ``grid_scale_factors``, differentiable metric optimised
    over the coefficient grid.  ``ncores``/``sampling_rate`` accepted for API
    parity (dense metric on device).
    Returns (registered_image, BSplineTransform).
    """
    from platipy_tpu.core.transform import BSplineTransform
    from platipy_tpu.registration import metrics as _metrics
    from platipy_tpu.registration.optimise import optimise
    from platipy_tpu.registration.utils import (
        apply_transform,
        control_point_spacing_distance_to_number,
        smooth_and_resample,
    )
    from platipy_tpu.core.resample import resample as _resample
    from platipy_tpu.core.interp import INTERP_LINEAR, INTERP_NEAREST

    fixed_image32 = fixed_image.astype(jnp.float32)
    moving_dtype = moving_image.array.dtype
    moving_image32 = moving_image.astype(jnp.float32)

    if isotropic_resample:
        fixed_image_original = fixed_image32
        fixed_image32 = smooth_and_resample(
            fixed_image32, isotropic_voxel_size_mm=initial_isotropic_size
        )
        moving_image32 = smooth_and_resample(
            moving_image32, isotropic_voxel_size_mm=initial_isotropic_size
        )
    else:
        fixed_image_original = fixed_image32

    metric_fn = _metrics.get_metric(metric)
    if metric.lower() in ("mutual_information", "mattes_mi"):
        metric_fn = functools.partial(_metrics.mattes_mi, bins=number_of_histogram_bins_mi)

    # initial control grid over the fixed image domain
    mesh_size = control_point_spacing_distance_to_number(
        fixed_image32, initial_grid_spacing
    )
    extent = np.asarray(fixed_image32.size) * np.asarray(fixed_image32.spacing)

    transform = None
    for level, (shrink, sigma, gsf) in enumerate(
        zip(resolution_staging, smooth_sigmas, grid_scale_factors)
    ):
        f_level = smooth_and_resample(
            fixed_image32, shrink_factor=shrink if shrink != 1 else None,
            smoothing_sigma=sigma if sigma else None,
        )
        m_level = smooth_and_resample(
            moving_image32, shrink_factor=shrink if shrink != 1 else None,
            smoothing_sigma=sigma if sigma else None,
        )

        level_mesh = np.maximum((np.asarray(mesh_size) * gsf).astype(int), 1)
        grid_spacing = extent / level_mesh
        grid_origin = np.asarray(fixed_image32.origin) - grid_spacing
        grid_shape = (int(level_mesh[2]) + 3, int(level_mesh[1]) + 3,
                      int(level_mesh[0]) + 3)

        coefficients = jnp.zeros(grid_shape + (3,), jnp.float32)
        if transform is not None:
            # refine: sample the previous displacement at the new knots
            knots = np.stack(
                np.meshgrid(
                    grid_origin[0] + np.arange(grid_shape[2]) * grid_spacing[0],
                    grid_origin[1] + np.arange(grid_shape[1]) * grid_spacing[1],
                    grid_origin[2] + np.arange(grid_shape[0]) * grid_spacing[2],
                    indexing="ij",
                ),
                axis=-1,
            ).reshape(-1, 3)
            disp = transform.displacement(jnp.asarray(knots, jnp.float32))
            coefficients = jnp.asarray(disp).reshape(
                grid_shape[2], grid_shape[1], grid_shape[0], 3
            ).transpose(2, 1, 0, 3)

        transform = BSplineTransform(coefficients, grid_origin, grid_spacing)

        f_arr = f_level.array
        ones_m = m_level.with_array(jnp.ones_like(m_level.array))
        f_mask_level = None
        if fixed_structure is not False and fixed_structure is not None:
            f_mask_level = _resample(fixed_structure.astype(jnp.float32), f_level,
                                     None, interp=INTERP_NEAREST, default_value=0.0)

        def loss_fn(t, _f=f_level, _m=m_level, _fa=f_arr, _ones=ones_m,
                    _fm=f_mask_level):
            warped = _resample(_m, _f, t, interp=INTERP_LINEAR, default_value=0.0)
            valid = _resample(_ones, _f, t, interp=INTERP_NEAREST, default_value=0.0)
            weight = valid.array
            if _fm is not None:
                weight = weight * (_fm.array > 0.5).astype(jnp.float32)
            metric_value = metric_fn(_fa, warped.array, weight)
            # Valid-count-normalised metrics make "everything maps outside"
            # a degenerate global minimum (weight sum -> 0, loss -> 0); ITK
            # raises "too many samples map outside the moving image buffer"
            # instead.  The jit-compatible equivalent: a huge finite penalty
            # once under 25% of reference points land inside, so line
            # searches backtrack out of the degenerate basin.
            frac_inside = jnp.mean(valid.array)
            return jnp.where(frac_inside < 0.25, jnp.float32(1e30), metric_value)

        transform, final_loss = optimise(
            loss_fn,
            transform,
            optimiser=optimiser,
            learning_rate=1.0,
            number_of_iterations=number_of_iterations,
            scales=None,
            max_step_physical=float(max(f_level.spacing)),
        )
        if verbose:
            print(f"bspline level {level}: metric = {final_loss:.6f}")

    registered_image = apply_transform(
        input_image=moving_image32,
        reference_image=fixed_image_original,
        transform=transform,
        default_value=default_value,
        interpolator=interp_order,
    )
    if not jnp.issubdtype(moving_dtype, jnp.floating):
        registered_image = registered_image.with_array(
            jnp.rint(registered_image.array).astype(moving_dtype)
        )
    else:
        registered_image = registered_image.astype(moving_dtype)

    return registered_image, transform
