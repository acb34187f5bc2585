"""Separable filters: Gaussian smoothing, box mean, central-difference gradients.

TPU-native equivalents of ITK's ``DiscreteGaussianImageFilter`` /
``SmoothingRecursiveGaussianImageFilter`` / ``BoxMeanImageFilter`` (reference
call sites: registration/utils.py:226, deformable.py:158, label/fusion.py:168,279).

All filters run as three 1-D convolutions (XLA fuses the pad+conv chain and
keeps it HBM-bandwidth bound).  Boundary condition is zero-flux Neumann
(edge-replicate), matching ITK's default.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special as _sps

from platipy_tpu.core.image import Image

__all__ = [
    "gaussian_kernel1d",
    "discrete_gaussian_kernel1d",
    "convolve_separable",
    "gaussian_smooth",
    "discrete_gaussian",
    "smoothing_recursive_gaussian",
    "box_mean",
    "gradient",
    "median3",
]


def _as3(v) -> np.ndarray:
    arr = np.asarray(v, dtype=np.float64).reshape(-1)
    if arr.size == 1:
        arr = np.repeat(arr, 3)
    return arr


# ---------------------------------------------------------------------------
# kernels (computed host-side at trace time; sigmas are static)
# ---------------------------------------------------------------------------

def discrete_gaussian_kernel1d(
    variance_vox: float, max_error: float = 0.01, max_width: int = 32
) -> np.ndarray:
    """ITK-style discrete Gaussian kernel T(n,t) = exp(-t) I_n(t), t = sigma_vox^2.

    Coefficients are grown until the tail error is below ``max_error`` (or the
    radius hits ``max_width``), then normalised to sum 1 — mirroring
    ``itk::GaussianOperator``.
    """
    t = float(variance_vox)
    if t <= 0:
        return np.ones(1)
    radius = 1
    max_radius = max(1, int(max_width) // 2)
    while radius < max_radius:
        n = np.arange(-radius, radius + 1)
        coeffs = _sps.ive(np.abs(n), t)
        if 1.0 - coeffs.sum() < max_error:
            break
        radius += 1
    n = np.arange(-radius, radius + 1)
    coeffs = _sps.ive(np.abs(n), t)
    return coeffs / coeffs.sum()


def gaussian_kernel1d(sigma_vox: float, truncate: float = 4.0) -> np.ndarray:
    """Sampled (continuous) Gaussian kernel, radius = ceil(truncate*sigma)."""
    if sigma_vox <= 0:
        return np.ones(1)
    radius = max(1, int(np.ceil(truncate * sigma_vox)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma_vox) ** 2)
    return k / k.sum()


# ---------------------------------------------------------------------------
# separable convolution
# ---------------------------------------------------------------------------

# Up to this axis length, 1-D convolution runs as a banded matmul on the MXU
# instead of shift-and-add taps on the VPU.  Shifted slicing is lane/sublane-
# rotate bound on TPU (~each tap rotates the whole tile); a banded [n,n]
# matmul does the same contraction at MXU rates.  Edge-replicate padding is
# folded into the boundary rows of the matrix, so semantics match exactly.
_CONV_MM_LIMIT = 1024


def _conv1d_along_axis(arr: jnp.ndarray, kernel: np.ndarray, axis: int,
                       precision: str = "highest") -> jnp.ndarray:
    """Convolve [z,y,x(,c)] array along a spatial axis, edge-replicate padding.

    Dispatched as one jitted program per (shape, kernel, axis) — on remote
    backends eager op-by-op dispatch is prohibitively slow.  ``precision``
    selects the MXU pass count for the banded-matmul path ("highest" = 6-pass
    f32-accurate, "default" = single-pass bf16 inputs — iterative smoothing
    loops tolerate bf16, one-shot public filters keep f32 parity).
    """
    n = arr.shape[axis]
    kernel_key = tuple(float(v) for v in kernel)
    if 1 < n <= _CONV_MM_LIMIT and len(kernel_key) > 1:
        return _conv1d_mm_jit(arr, kernel_key=kernel_key, axis=axis, n=n,
                              precision=precision)
    return _conv1d_jit(arr, kernel_key=kernel_key, axis=axis)


def _conv_matrix(n: int, kernel: np.ndarray) -> np.ndarray:
    """Banded correlation matrix C[n,n]: row i sums taps at clip(i+k-r, 0, n-1)
    (edge replication folded into the boundary rows)."""
    c = np.zeros((n, n), dtype=np.float32)
    r = len(kernel) // 2  # same origin as _conv1d_jit
    rows = np.arange(n)
    for k, w in enumerate(kernel):
        cols = np.clip(rows + k - r, 0, n - 1)
        np.add.at(c, (rows, cols), float(w))
    return c


@partial(jax.jit, static_argnames=("kernel_key", "axis", "n", "precision"))
def _conv1d_mm_jit(arr: jnp.ndarray, *, kernel_key, axis: int, n: int,
                   precision: str = "highest") -> jnp.ndarray:
    c = jnp.asarray(_conv_matrix(n, np.asarray(kernel_key, dtype=np.float64)))
    dtype = arr.dtype if jnp.issubdtype(arr.dtype, jnp.floating) else jnp.float32
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]
    # band matrix in the INPUT dtype: a bf16 field must stay bf16 through
    # every separable pass (f32 c would promote and double the loop's HBM
    # traffic); the MXU still accumulates partial products in f32
    out = jnp.tensordot(c.astype(dtype), arr.astype(dtype),
                        axes=((1,), (axis,)), precision=prec)
    return jnp.moveaxis(out, 0, axis)


@partial(jax.jit, static_argnames=("kernel_key", "axis"))
def _conv1d_jit(arr: jnp.ndarray, *, kernel_key, axis: int) -> jnp.ndarray:
    # shift-and-add: k fused multiply-adds on the VPU.  A C=1 conv would pad
    # the channel dimension to the MXU tile and waste ~100x the FLOPs.
    # Integer inputs upcast to f32 (matching the matmul path) — casting the
    # fractional weights to an int dtype would zero them.
    if not jnp.issubdtype(arr.dtype, jnp.floating):
        arr = arr.astype(jnp.float32)
    kernel = np.asarray(kernel_key, dtype=np.float64)
    k = kernel.size
    if k == 1:
        return arr * float(kernel[0])
    r = k // 2
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (r, k - 1 - r)
    x = jnp.pad(arr, pad, mode="edge")
    n = arr.shape[axis]
    out = None
    for i, w in enumerate(kernel):
        sh = jax.lax.dynamic_slice_in_dim(x, i, n, axis) * jnp.asarray(w, arr.dtype)
        out = sh if out is None else out + sh
    return out


def convolve_separable(
    arr: jnp.ndarray, kernels: Sequence[np.ndarray], axes: Sequence[int] = (0, 1, 2),
    precision: str = "highest",
) -> jnp.ndarray:
    """Apply 1-D kernels along the given axes in turn; kernels[i] for axes[i].

    Defaults to the (z, y, x) axes of a [z,y,x(,c)] array; pass explicit axes
    for batched stacks (e.g. axes=(1,2,3) for [N,z,y,x]).
    """
    out = arr
    for axis, kern in zip(axes, kernels):
        if kern is None or kern.size == 1:
            continue
        out = _conv1d_along_axis(out, np.asarray(kern, dtype=np.float64), axis,
                                 precision=precision)
    return out


# ---------------------------------------------------------------------------
# public smoothers
# ---------------------------------------------------------------------------

def discrete_gaussian(
    image: Image,
    variance,
    maximum_kernel_width: int = 32,
    maximum_error: float = 0.01,
    use_image_spacing: bool = True,
) -> Image:
    """``sitk.DiscreteGaussian`` analogue: variance in physical units^2."""
    var = _as3(variance)  # (x, y, z)
    spacing = np.asarray(image.spacing)
    var_vox = var / spacing**2 if use_image_spacing else var
    kernels_zyx = [
        discrete_gaussian_kernel1d(var_vox[2], maximum_error, maximum_kernel_width),
        discrete_gaussian_kernel1d(var_vox[1], maximum_error, maximum_kernel_width),
        discrete_gaussian_kernel1d(var_vox[0], maximum_error, maximum_kernel_width),
    ]
    arr = image.array.astype(jnp.float32)
    return image.with_array(convolve_separable(arr, kernels_zyx))


def gaussian_smooth(
    image_or_array: Union[Image, jnp.ndarray],
    sigma_vox,
    truncate: float = 4.0,
):
    """Smooth with sampled Gaussian; sigma given per (z,y,x) axis in voxels."""
    sig = _as3(sigma_vox)  # (z, y, x) here — raw array-axis order
    kernels = [gaussian_kernel1d(s, truncate) for s in sig]
    if isinstance(image_or_array, Image):
        arr = image_or_array.array.astype(jnp.float32)
        return image_or_array.with_array(convolve_separable(arr, kernels))
    return convolve_separable(jnp.asarray(image_or_array, jnp.float32), kernels)


def smoothing_recursive_gaussian(image: Image, sigma_phys) -> Image:
    """``sitk.SmoothingRecursiveGaussian`` analogue (sigma in physical units).

    Implemented as a truncated FIR Gaussian — matches the recursive IIR
    approximation well within the pipeline's tolerance, and maps far better
    onto the TPU's vector units than a sequential scan.
    """
    sig = _as3(sigma_phys)  # (x, y, z)
    spacing = np.asarray(image.spacing)
    sig_vox = sig / spacing
    kernels_zyx = [
        gaussian_kernel1d(sig_vox[2]),
        gaussian_kernel1d(sig_vox[1]),
        gaussian_kernel1d(sig_vox[0]),
    ]
    arr = image.array.astype(jnp.float32)
    return image.with_array(convolve_separable(arr, kernels_zyx))


def box_mean(image: Image, radius) -> Image:
    """``sitk.BoxMean`` analogue: radius per (x,y,z) axis in voxels."""
    rad = np.asarray(_as3(radius), dtype=np.int64)
    kernels_zyx = []
    for r in (rad[2], rad[1], rad[0]):
        n = 2 * int(r) + 1
        kernels_zyx.append(np.full(n, 1.0 / n))
    arr = image.array.astype(jnp.float32)
    return image.with_array(convolve_separable(arr, kernels_zyx))


def median3(image: Image) -> Image:
    """3x3x3 median filter (``sitk.Median`` with radius 1)."""
    arr = image.array.astype(jnp.float32)
    padded = jnp.pad(arr, 1, mode="edge")
    stacks = []
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                stacks.append(
                    jax.lax.dynamic_slice(
                        padded, (dz, dy, dx), arr.shape
                    )
                )
    stacked = jnp.stack(stacks, axis=0)
    med = jnp.median(stacked, axis=0)
    return image.with_array(med)


# ---------------------------------------------------------------------------
# gradients
# ---------------------------------------------------------------------------

def gradient(array: jnp.ndarray, spacing_xyz) -> jnp.ndarray:
    """Central-difference gradient of [z,y,x] scalar field, physical units.

    Returns [z,y,x,3] with components in (x,y,z) order — what the demons force
    needs (ITK ``CentralDifferenceImageFunction`` semantics, replicate edges).
    """
    s = _as3(spacing_xyz)

    def central(a, axis, h):
        upper = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 1, a.shape[axis], axis=axis),
             jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis], axis=axis)],
            axis=axis,
        )
        lower = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 0, 1, axis=axis),
             jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)],
            axis=axis,
        )
        return (upper - lower) / (2.0 * h)

    gx = central(array, 2, s[0])
    gy = central(array, 1, s[1])
    gz = central(array, 0, s[2])
    return jnp.stack([gx, gy, gz], axis=-1)
