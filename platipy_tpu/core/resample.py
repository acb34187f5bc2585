"""Resampling — ITK ``ResampleImageFilter`` semantics on device.

``resample(input_image, reference, transform, ...)`` produces an image on the
reference grid where ``out[i] = input( T( P_ref(i) ) )`` — i.e. the transform
maps reference (fixed) physical points into input (moving) physical space,
exactly the convention of ``sitk.Resample`` as used throughout the reference
(/root/reference/platipy/imaging/registration/utils.py:148-192).

Fast paths:
* linear transforms fold (ref index -> phys -> T -> phys -> input index) into a
  single affine, evaluated via broadcasted 1-D iotas (no [N,3] point tensor);
* ``warp_image`` takes a dense DVF defined *on the reference grid* (the demons
  inner-loop case) and skips the field interpolation entirely.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core import interp as _interp
from platipy_tpu.core.image import Image, index_to_physical_matrix, physical_to_index_matrix
from platipy_tpu.core.transform import (
    CompositeTransform,
    DisplacementFieldTransform,
    Transform,
    TranslationTransform,
)

__all__ = ["resample", "warp_image", "identity_dvf", "transform_to_displacement_field"]


def _linear_hmatrix_jnp(transform: Transform) -> jnp.ndarray:
    """Differentiable 4x4 homogeneous matrix for a linear transform."""
    if isinstance(transform, CompositeTransform):
        m = jnp.eye(4)
        for t in reversed(transform.transforms):
            m = jnp.matmul(_linear_hmatrix_jnp(t), m, precision=jax.lax.Precision.HIGHEST)
        return m
    if isinstance(transform, TranslationTransform):
        m = jnp.eye(4)
        return m.at[:3, 3].set(transform.translation)
    if hasattr(transform, "hmatrix"):
        return jnp.asarray(transform.hmatrix)
    a = transform.matrix()
    c = jnp.asarray(transform.center)
    t = jnp.asarray(transform.translation)
    m = jnp.eye(4, dtype=a.dtype)
    m = m.at[:3, :3].set(a)
    # A@c carries the physical centre (|c| can be hundreds of mm): pin to f32
    # — the TPU default would round both operands to bf16 (~mm-scale error)
    ac = jnp.matmul(a, c, precision=jax.lax.Precision.HIGHEST)
    m = m.at[:3, 3].set(c + t - ac)
    return m


def _ref_grid(reference) -> tuple:
    if isinstance(reference, Image):
        return reference.spatial_shape, reference.origin, reference.spacing, reference.direction
    raise TypeError("reference must be an Image")


import functools


@functools.partial(
    jax.jit, static_argnames=("shape_zyx", "interp_code", "default_value", "out_dtype_name")
)
def _resample_linear_impl(array, transform, ref_i2p, mov_p2i, *, shape_zyx, interp_code,
                          default_value, out_dtype_name):
    t_h = _linear_hmatrix_jnp(transform).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    total_mat = jnp.matmul(jnp.matmul(mov_p2i, t_h, precision=hp), ref_i2p, precision=hp)

    a, b = total_mat[:3, :3], total_mat[:3, 3]
    ix, iy, iz = _interp.grid_continuous_indices(shape_zyx)
    ux = a[0, 0] * ix + a[0, 1] * iy + a[0, 2] * iz + b[0]
    uy = a[1, 0] * ix + a[1, 1] * iy + a[1, 2] * iz + b[1]
    uz = a[2, 0] * ix + a[2, 1] * iy + a[2, 2] * iz + b[2]
    out = _interp.sample_at_continuous_index(
        array, ux, uy, uz, interp=interp_code, default_value=default_value
    )
    return _cast_out(out, out_dtype_name)


@functools.partial(
    jax.jit, static_argnames=("shape_zyx", "interp_code", "default_value", "out_dtype_name")
)
def _resample_generic_impl(array, transform, ref_i2p, mov_p2i, *, shape_zyx, interp_code,
                           default_value, out_dtype_name):
    points = _grid_physical_points(shape_zyx, ref_i2p)
    moved = transform.apply(points.reshape(-1, 3)).reshape(points.shape)
    a = mov_p2i[:3, :3]
    b = mov_p2i[:3, 3]
    u = jnp.matmul(moved, a.T, precision=jax.lax.Precision.HIGHEST) + b
    out = _interp.sample_at_continuous_index(
        array, u[..., 0], u[..., 1], u[..., 2], interp=interp_code,
        default_value=default_value,
    )
    return _cast_out(out, out_dtype_name)


def _cast_out(out, out_dtype_name):
    if out_dtype_name is None:
        return out
    dtype = jnp.dtype(out_dtype_name)
    if not jnp.issubdtype(dtype, jnp.floating):
        # integer outputs round like ITK's output cast for NN/linear paths
        out = jnp.rint(out)
    return out.astype(dtype)


def resample(
    input_image: Image,
    reference: Optional[Image] = None,
    transform: Optional[Transform] = None,
    interp=_interp.INTERP_LINEAR,
    default_value: float = 0.0,
    output_dtype=None,
    fast: bool = False,
) -> Image:
    """Resample ``input_image`` onto ``reference``'s grid through ``transform``.

    The array computation is one jit-compiled program (critical on remote
    backends where each eager op pays a dispatch round trip).

    ``fast=True`` routes linear interpolation through the gather-free shear
    factorisation (~10x faster on TPU for rotational affines; values differ
    from exact trilinear by the shear-warp interpolation cascade — fine for
    intermediate pipeline images, not for final quantitative outputs).
    """
    if reference is None:
        reference = input_image
    if transform is None:
        transform = TranslationTransform(jnp.zeros(3))
    shape_zyx, r_origin, r_spacing, r_direction = _ref_grid(reference)
    array = input_image.array
    in_dtype = array.dtype
    interp_code = _interp.interp_name(interp)
    if interp_code == _interp.INTERP_BSPLINE:
        array = _interp.spline_coefficients(array)

    ref_i2p = index_to_physical_matrix(r_origin, r_spacing, r_direction)
    mov_p2i = physical_to_index_matrix(
        input_image.origin, input_image.spacing, input_image.direction
    )

    if output_dtype is None:
        output_dtype = in_dtype
    out_dtype_name = jnp.dtype(output_dtype).name

    # axis-aligned fast path: no transform + identical directions means the
    # index->index map is diagonal -> exact separable resampling on the MXU
    is_identity_t = isinstance(transform, TranslationTransform) and not np.any(
        np.asarray(transform.translation)
    )
    if is_identity_t and np.allclose(
        input_image.direction, r_direction
    ) and abs(np.linalg.det(np.asarray(r_direction).reshape(3, 3))) > 1e-6:
        total = mov_p2i @ ref_i2p
        offdiag = total[:3, :3] - np.diag(np.diag(total[:3, :3]))
        if np.abs(offdiag).max() < 1e-9:
            axis_maps = (
                (float(total[0, 0]), float(total[0, 3])),
                (float(total[1, 1]), float(total[1, 3])),
                (float(total[2, 2]), float(total[2, 3])),
            )
            out = _interp.resample_separable(
                array, axis_maps, shape_zyx, interp=interp_code,
                default_value=float(default_value),
            )
            out = _cast_out(out, out_dtype_name)
            return Image(out, r_origin, r_spacing, r_direction)

    if transform.is_linear() and fast and interp_code == _interp.INTERP_LINEAR \
            and input_image.array.ndim == 3:
        out = _resample_linear_shear_impl(
            array, transform,
            jnp.asarray(ref_i2p, jnp.float32), jnp.asarray(mov_p2i, jnp.float32),
            shape_zyx=shape_zyx,
            default_value=float(default_value), out_dtype_name=out_dtype_name,
        )
    elif transform.is_linear():
        # Fold everything into one index->index affine (traced, differentiable).
        out = _resample_linear_impl(
            array, transform,
            jnp.asarray(ref_i2p, jnp.float32), jnp.asarray(mov_p2i, jnp.float32),
            shape_zyx=shape_zyx, interp_code=interp_code,
            default_value=float(default_value), out_dtype_name=out_dtype_name,
        )
    else:
        out = _resample_generic_impl(
            array, transform,
            jnp.asarray(ref_i2p, jnp.float32), jnp.asarray(mov_p2i, jnp.float32),
            shape_zyx=shape_zyx, interp_code=interp_code,
            default_value=float(default_value), out_dtype_name=out_dtype_name,
        )

    return Image(out, r_origin, r_spacing, r_direction)


def _grid_physical_points(shape_zyx, i2p) -> jnp.ndarray:
    nz, ny, nx = shape_zyx
    ix, iy, iz = _interp.grid_continuous_indices(shape_zyx)
    m = jnp.asarray(i2p, dtype=jnp.float32)
    px = m[0, 0] * ix + m[0, 1] * iy + m[0, 2] * iz + m[0, 3]
    py = m[1, 0] * ix + m[1, 1] * iy + m[1, 2] * iz + m[1, 3]
    pz = m[2, 0] * ix + m[2, 1] * iy + m[2, 2] * iz + m[2, 3]
    px, py, pz = jnp.broadcast_arrays(px, py, pz)
    return jnp.stack([px, py, pz], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("shape_zyx", "interp_code", "default_value")
)
def _warp_impl(array, dvf_arr, ref_i2p, mov_p2i, *, shape_zyx, interp_code, default_value):
    points = _grid_physical_points(shape_zyx, ref_i2p) + dvf_arr
    a = mov_p2i[:3, :3]
    b = mov_p2i[:3, 3]
    u = jnp.matmul(points, a.T, precision=jax.lax.Precision.HIGHEST) + b
    return _interp.sample_at_continuous_index(
        array, u[..., 0], u[..., 1], u[..., 2], interp=interp_code,
        default_value=default_value,
    )


def warp_image(
    moving: Image,
    dvf: Image,
    reference: Optional[Image] = None,
    interp=_interp.INTERP_LINEAR,
    default_value: float = 0.0,
) -> Image:
    """Warp ``moving`` by a dense displacement field.

    The DVF ([z,y,x,3], physical mm, (x,y,z) components) is defined on
    ``reference``'s grid (defaults to the DVF's own grid).  Equivalent to
    ``sitk.Resample(moving, ref, DisplacementFieldTransform(dvf))`` but without
    re-interpolating the field.
    """
    if reference is None:
        reference = dvf
    shape_zyx = reference.spatial_shape
    ref_i2p = index_to_physical_matrix(reference.origin, reference.spacing, reference.direction)
    mov_p2i = physical_to_index_matrix(moving.origin, moving.spacing, moving.direction)
    array = moving.array
    interp_code = _interp.interp_name(interp)
    if interp_code == _interp.INTERP_BSPLINE:
        array = _interp.spline_coefficients(array)
    out = _warp_impl(
        array, dvf.array,
        jnp.asarray(ref_i2p, jnp.float32), jnp.asarray(mov_p2i, jnp.float32),
        shape_zyx=shape_zyx, interp_code=interp_code, default_value=float(default_value),
    )
    out = out.astype(
        moving.array.dtype if jnp.issubdtype(moving.array.dtype, jnp.floating) else jnp.float32
    )
    return Image(out, reference.origin, reference.spacing, reference.direction)


def identity_dvf(reference: Image, dtype=jnp.float32) -> Image:
    """Zero displacement field on the reference grid ([z,y,x,3])."""
    nz, ny, nx = reference.spatial_shape
    return Image(
        jnp.zeros((nz, ny, nx, 3), dtype=dtype),
        reference.origin,
        reference.spacing,
        reference.direction,
    )


def transform_to_displacement_field(transform: Transform, reference: Image) -> Image:
    """Dense DVF of ``transform`` on the reference grid.

    Mirrors ``sitk.TransformToDisplacementField`` (used at
    reference deformable.py:100-106): field[i] = T(P(i)) - P(i).
    """
    ref_i2p = index_to_physical_matrix(reference.origin, reference.spacing, reference.direction)
    points = _grid_physical_points(reference.spatial_shape, ref_i2p)
    moved = transform.apply(points.reshape(-1, 3)).reshape(points.shape)
    return Image(moved - points, reference.origin, reference.spacing, reference.direction)


def invert_displacement_field(dvf: Image, iterations: int = 20) -> Image:
    """Fixed-point inverse of a dense displacement field.

    Finds v with (id + v) ∘ (id + u) ≈ id by iterating
    v_{k+1}(x) = -u(x + v_k(x)) — i.e. resample u through the current inverse
    and negate.  Mirrors ``sitk.InvertDisplacementField``
    (reference visualiser.py:1536).  Out-of-grid samples clamp to the border.
    """
    u = dvf.array
    ref_i2p = jnp.asarray(
        index_to_physical_matrix(dvf.origin, dvf.spacing, dvf.direction), jnp.float32
    )
    ref_p2i = jnp.asarray(
        physical_to_index_matrix(dvf.origin, dvf.spacing, dvf.direction), jnp.float32
    )
    points = _grid_physical_points(dvf.spatial_shape, ref_i2p)

    def sample_u(v):
        q = points + v
        a, b = ref_p2i[:3, :3], ref_p2i[:3, 3]
        idx = jnp.matmul(q, a.T, precision=jax.lax.Precision.HIGHEST) + b
        nz, ny, nx = u.shape[:3]
        ix = jnp.clip(idx[..., 0], 0.0, nx - 1.0)
        iy = jnp.clip(idx[..., 1], 0.0, ny - 1.0)
        iz = jnp.clip(idx[..., 2], 0.0, nz - 1.0)
        return _interp.sample_at_continuous_index(
            u, ix, iy, iz, interp=_interp.INTERP_LINEAR
        )

    def body(_, v):
        return -sample_u(v)

    v = jax.lax.fori_loop(0, int(iterations), body, jnp.zeros_like(u))
    return Image(v, dvf.origin, dvf.spacing, dvf.direction)


@functools.partial(
    jax.jit, static_argnames=("shape_zyx", "default_value", "out_dtype_name")
)
def _resample_linear_shear_impl(array, transform, ref_i2p, mov_p2i, *, shape_zyx,
                                default_value, out_dtype_name):
    """Trilinear affine resample via the gather-free shear factorisation.

    ~10x faster than the gather formulation on TPU but cascades three 1-D
    interpolations (classic shear-warp), so values differ slightly from exact
    trilinear for rotational maps — used for pipeline-internal warps (inputs
    to demons, crop-box estimation) where the downstream registration refines
    the result; the public ``resample`` keeps exact gather semantics.  Falls
    back to gathers at runtime when the factorisation pivots degenerate
    (e.g. ~90-degree rotations).
    """
    t_h = _linear_hmatrix_jnp(transform).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    total_mat = jnp.matmul(jnp.matmul(mov_p2i, t_h, precision=hp), ref_i2p, precision=hp)

    def gather_path(_):
        a, b = total_mat[:3, :3], total_mat[:3, 3]
        ix, iy, iz = _interp.grid_continuous_indices(shape_zyx)
        ux = a[0, 0] * ix + a[0, 1] * iy + a[0, 2] * iz + b[0]
        uy = a[1, 0] * ix + a[1, 1] * iy + a[1, 2] * iz + b[1]
        uz = a[2, 0] * ix + a[2, 1] * iy + a[2, 2] * iz + b[2]
        return _interp.sample_at_continuous_index(
            array, ux, uy, uz, interp=_interp.INTERP_LINEAR,
            default_value=default_value,
        )

    def shear_path(_):
        out, _inside = _interp.affine_shear_resample(
            array.astype(jnp.float32), total_mat, shape_zyx,
            default_value=default_value,
        )
        return out

    r_x, r_y, _r_z = _interp._shear_factors(total_mat)
    ok = (
        (jnp.abs(total_mat[2, 2]) > 0.25)
        & (jnp.abs(r_y[1]) > 0.25)
        & (jnp.abs(r_x[0]) > 0.25)
        & jnp.all(jnp.isfinite(r_x))
        & jnp.all(jnp.isfinite(r_y))
    )
    out = jax.lax.cond(ok, shear_path, gather_path, operand=None)
    return _cast_out(out, out_dtype_name)
