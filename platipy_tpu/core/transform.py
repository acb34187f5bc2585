"""Transform algebra — parameterised spatial transforms as JAX pytrees.

TPU-native equivalent of the ITK transform classes used by the reference
(/root/reference/platipy/imaging/registration/linear.py:166-204 and
registration/deformable.py:96-125): translation, Euler rigid, versor rigid,
similarity, affine, scale, scale-versor, scale-skew-versor, dense displacement
field, B-spline FFD, and composition.

Conventions (matching ITK resampling semantics):

* A transform maps a physical point in the FIXED (output/reference) space to a
  physical point in the MOVING (input) space:  ``p_moving = T(p_fixed)``.
* Linear transforms use a fixed centre ``c``:  ``T(p) = A @ (p - c) + c + t``.
* ``CompositeTransform([T0, T1])`` applies the *last-added first*:
  ``T(p) = T0(T1(p))`` — exactly ITK's convention, so the reference's
  ``CompositeTransform([initial, optimised])`` (linear.py:240) composes the same
  way here.
* All ``apply`` methods take/return arrays shaped ``[..., 3]`` in (x, y, z)
  physical coordinates, are jit-traceable, and differentiate w.r.t. parameters.

Parameters are stored as jnp arrays (pytree leaves) so optax can optimise the
transform object directly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Transform",
    "TranslationTransform",
    "Euler3DTransform",
    "VersorRigid3DTransform",
    "Similarity3DTransform",
    "ScaleTransform",
    "ScaleVersor3DTransform",
    "ScaleSkewVersor3DTransform",
    "AffineTransform",
    "MatrixTransform",
    "DisplacementFieldTransform",
    "BSplineTransform",
    "CompositeTransform",
    "centered_transform_initializer",
    "versor_to_matrix",
    "euler_to_matrix",
]


class Transform:
    """Base class. Subclasses implement ``apply`` (points [...,3] -> [...,3])."""

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:  # pragma: no cover
        raise NotImplementedError

    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        return self.apply(points)

    def is_linear(self) -> bool:
        return False

    def as_matrix(self) -> np.ndarray:
        """4x4 homogeneous matrix (host-side), only for linear transforms."""
        raise NotImplementedError(f"{type(self).__name__} is not linear")


# ---------------------------------------------------------------------------
# rotation parameterisations
# ---------------------------------------------------------------------------

def euler_to_matrix(angles: jnp.ndarray, order: str = "zxy") -> jnp.ndarray:
    """Rotation matrix from Euler angles (a_x, a_y, a_z).

    Default composition matches ITK ``Euler3DTransform`` with ComputeZYX off:
    ``R = Rz @ Rx @ Ry``.
    """
    ax, ay, az = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.ones_like(ax)
    zero = jnp.zeros_like(ax)
    rx = jnp.stack(
        [one, zero, zero, zero, cx, -sx, zero, sx, cx]
    ).reshape(3, 3)
    ry = jnp.stack(
        [cy, zero, sy, zero, one, zero, -sy, zero, cy]
    ).reshape(3, 3)
    rz = jnp.stack(
        [cz, -sz, zero, sz, cz, zero, zero, zero, one]
    ).reshape(3, 3)
    if order == "zxy":
        return _mm_hi(rz, _mm_hi(rx, ry))
    if order == "zyx":
        return _mm_hi(rz, _mm_hi(ry, rx))
    raise ValueError(order)


def versor_to_matrix(versor: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from the vector part (v1,v2,v3) of a unit quaternion.

    ITK's ``VersorRigid3DTransform`` parameterises rotation by the versor's
    right (vector) part; ``w = sqrt(1 - |v|^2)`` (|v| clamped < 1).
    """
    v = versor
    n2 = jnp.sum(v * v)
    n2 = jnp.minimum(n2, 1.0 - 1e-12)
    w = jnp.sqrt(1.0 - n2)
    x, y, z = v[0], v[1], v[2]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def _mm_hi(a, b):
    """3x3/4x4 coordinate matmul pinned to f32 (TPU default rounds to bf16 —
    ~4e-3 absolute error per entry, mm-scale once a physical centre rides in
    the homogeneous column)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _apply_linear(points, matrix, center, translation):
    # coordinate math must stay f32 on TPU (default matmul precision is bf16)
    return (
        jnp.matmul(points - center, matrix.T, precision=jax.lax.Precision.HIGHEST)
        + center + translation
    )


def _linear_as_matrix(matrix, center, translation) -> np.ndarray:
    m = np.eye(4)
    a = np.asarray(matrix, dtype=np.float64)
    c = np.asarray(center, dtype=np.float64)
    t = np.asarray(translation, dtype=np.float64)
    m[:3, :3] = a
    m[:3, 3] = c + t - a @ c
    return m


def _f(x, n=3):
    return jnp.asarray(x, dtype=jnp.float32).reshape(n)


# ---------------------------------------------------------------------------
# linear transforms
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TranslationTransform(Transform):
    translation: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))

    def tree_flatten(self):
        return (self.translation,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def apply(self, points):
        return points + self.translation

    def is_linear(self):
        return True

    def matrix(self):
        return jnp.eye(3)

    def as_matrix(self):
        return _linear_as_matrix(np.eye(3), np.zeros(3), np.asarray(self.translation))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Euler3DTransform(Transform):
    """Rigid: Euler angles (radians) + translation about a centre."""

    angles: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    translation: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    center: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))

    def tree_flatten(self):
        return (self.angles, self.translation, self.center), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def matrix(self):
        return euler_to_matrix(self.angles)

    def apply(self, points):
        return _apply_linear(points, self.matrix(), self.center, self.translation)

    def is_linear(self):
        return True

    def as_matrix(self):
        return _linear_as_matrix(
            np.asarray(self.matrix()), np.asarray(self.center), np.asarray(self.translation)
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class VersorRigid3DTransform(Transform):
    versor: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    translation: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    center: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))

    def tree_flatten(self):
        return (self.versor, self.translation, self.center), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def matrix(self):
        return versor_to_matrix(self.versor)

    def apply(self, points):
        return _apply_linear(points, self.matrix(), self.center, self.translation)

    def is_linear(self):
        return True

    def as_matrix(self):
        return _linear_as_matrix(
            np.asarray(self.matrix()), np.asarray(self.center), np.asarray(self.translation)
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Similarity3DTransform(Transform):
    """Versor rotation + isotropic scale + translation (ITK Similarity3D).

    Scale is parameterised by its log so optimisation is unconstrained; the
    identity is log_scale=0.
    """

    versor: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    log_scale: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros((), np.float32))
    translation: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    center: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))

    def tree_flatten(self):
        return (self.versor, self.log_scale, self.translation, self.center), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def matrix(self):
        return jnp.exp(self.log_scale) * versor_to_matrix(self.versor)

    def apply(self, points):
        return _apply_linear(points, self.matrix(), self.center, self.translation)

    def is_linear(self):
        return True

    def as_matrix(self):
        return _linear_as_matrix(
            np.asarray(self.matrix()), np.asarray(self.center), np.asarray(self.translation)
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ScaleTransform(Transform):
    log_scale: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    center: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))

    def tree_flatten(self):
        return (self.log_scale, self.center), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def matrix(self):
        return jnp.diag(jnp.exp(self.log_scale))

    def apply(self, points):
        return _apply_linear(points, self.matrix(), self.center, jnp.zeros(3))

    def is_linear(self):
        return True

    def as_matrix(self):
        return _linear_as_matrix(np.asarray(self.matrix()), np.asarray(self.center), np.zeros(3))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ScaleVersor3DTransform(Transform):
    """ITK ScaleVersor3D: M = R + diag(s) - I (rotation plus anisotropic scale)."""

    versor: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    log_scale: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    translation: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    center: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))

    def tree_flatten(self):
        return (self.versor, self.log_scale, self.translation, self.center), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def matrix(self):
        r = versor_to_matrix(self.versor)
        return r + jnp.diag(jnp.exp(self.log_scale)) - jnp.eye(3)

    def apply(self, points):
        return _apply_linear(points, self.matrix(), self.center, self.translation)

    def is_linear(self):
        return True

    def as_matrix(self):
        return _linear_as_matrix(
            np.asarray(self.matrix()), np.asarray(self.center), np.asarray(self.translation)
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ScaleSkewVersor3DTransform(Transform):
    """ITK ScaleSkewVersor3D: M = R @ (S + K) with S diag scale, K strict-upper skew."""

    versor: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    log_scale: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    skew: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(6, np.float32))
    translation: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    center: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))

    def tree_flatten(self):
        return (self.versor, self.log_scale, self.skew, self.translation, self.center), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def matrix(self):
        r = versor_to_matrix(self.versor)
        s = jnp.exp(self.log_scale)
        k = self.skew
        sk = jnp.array(
            [
                [s[0], k[0], k[1]],
                [k[2], s[1], k[3]],
                [k[4], k[5], s[2]],
            ]
        )
        return _mm_hi(r, sk)

    def apply(self, points):
        return _apply_linear(points, self.matrix(), self.center, self.translation)

    def is_linear(self):
        return True

    def as_matrix(self):
        return _linear_as_matrix(
            np.asarray(self.matrix()), np.asarray(self.center), np.asarray(self.translation)
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class AffineTransform(Transform):
    matrix_params: jnp.ndarray = dataclasses.field(default_factory=lambda: np.eye(3, dtype=np.float32))
    translation: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    center: jnp.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))

    def tree_flatten(self):
        return (self.matrix_params, self.translation, self.center), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def matrix(self):
        return self.matrix_params

    def apply(self, points):
        return _apply_linear(points, self.matrix_params, self.center, self.translation)

    def is_linear(self):
        return True

    def as_matrix(self):
        return _linear_as_matrix(
            np.asarray(self.matrix_params), np.asarray(self.center), np.asarray(self.translation)
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MatrixTransform(Transform):
    """A raw homogeneous 4x4 transform (host-constructed, e.g. from composition)."""

    hmatrix: jnp.ndarray = dataclasses.field(default_factory=lambda: np.eye(4, dtype=np.float32))

    def tree_flatten(self):
        return (self.hmatrix,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def apply(self, points):
        return (
            jnp.matmul(points, self.hmatrix[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
            + self.hmatrix[:3, 3]
        )

    def is_linear(self):
        return True

    def as_matrix(self):
        return np.asarray(self.hmatrix, dtype=np.float64)


# ---------------------------------------------------------------------------
# non-linear transforms
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class DisplacementFieldTransform(Transform):
    """Dense DVF transform: T(p) = p + interp(field, p).

    ``field`` is an Image-like with array [z, y, x, 3] — displacement vectors in
    physical (x, y, z) mm, defined on its own grid (origin/spacing/direction).
    Matches ``sitk.DisplacementFieldTransform`` semantics (linear interpolation
    of the field; zero displacement outside the field domain).
    """

    def __init__(self, field):
        # `field` is a platipy_tpu Image (kept duck-typed to avoid import cycle)
        self.field = field

    def tree_flatten(self):
        return (self.field,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def apply(self, points):
        from platipy_tpu.core.interp import sample_image

        disp = sample_image(
            self.field.array,
            points,
            origin=self.field.origin,
            spacing=self.field.spacing,
            direction=self.field.direction,
            interp="linear",
            default_value=0.0,
        )
        return points + disp


@jax.tree_util.register_pytree_node_class
class BSplineTransform(Transform):
    """Cubic B-spline free-form deformation.

    Control-point coefficients ``coefficients`` shaped [gz, gy, gx, 3] (physical
    mm displacements) on a regular control grid defined by ``grid_origin`` /
    ``grid_spacing`` (x,y,z mm, identity direction assumed for the control grid,
    matching how the reference initialises its FFD over the fixed image,
    deformable.py:504-516).

    T(p) = p + sum_{ijk} B3(u_x-i) B3(u_y-j) B3(u_z-k) c_{kji}
    with u = (p - grid_origin) / grid_spacing.
    """

    def __init__(self, coefficients, grid_origin, grid_spacing):
        self.coefficients = jnp.asarray(coefficients)
        self.grid_origin = tuple(float(x) for x in np.asarray(grid_origin).reshape(3))
        self.grid_spacing = tuple(float(x) for x in np.asarray(grid_spacing).reshape(3))

    def tree_flatten(self):
        return (self.coefficients,), (self.grid_origin, self.grid_spacing)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @staticmethod
    def _bspline_weights(t):
        """Cubic B-spline basis values for fractional offset t in [0,1): 4 weights."""
        t2 = t * t
        t3 = t2 * t
        w0 = (1 - 3 * t + 3 * t2 - t3) / 6.0
        w1 = (4 - 6 * t2 + 3 * t3) / 6.0
        w2 = (1 + 3 * t + 3 * t2 - 3 * t3) / 6.0
        w3 = t3 / 6.0
        return jnp.stack([w0, w1, w2, w3], axis=-1)

    def displacement(self, points):
        pts = jnp.asarray(points)
        flat = pts.reshape(-1, 3)
        go = jnp.asarray(self.grid_origin, dtype=flat.dtype)
        gs = jnp.asarray(self.grid_spacing, dtype=flat.dtype)
        u = (flat - go) / gs  # continuous control-grid coords (x,y,z)
        i0 = jnp.floor(u).astype(jnp.int32) - 1  # support starts one knot left
        t = u - jnp.floor(u)
        wx = self._bspline_weights(t[:, 0])  # [N,4]
        wy = self._bspline_weights(t[:, 1])
        wz = self._bspline_weights(t[:, 2])
        gz, gy, gx = self.coefficients.shape[:3]
        disp = jnp.zeros_like(flat)
        for dz in range(4):
            iz = jnp.clip(i0[:, 2] + dz, 0, gz - 1)
            for dy in range(4):
                iy = jnp.clip(i0[:, 1] + dy, 0, gy - 1)
                wzy = wz[:, dz] * wy[:, dy]
                for dx in range(4):
                    ix = jnp.clip(i0[:, 0] + dx, 0, gx - 1)
                    w = (wzy * wx[:, dx])[:, None]
                    disp = disp + w * self.coefficients[iz, iy, ix, :]
        return disp.reshape(pts.shape)

    def apply(self, points):
        return points + self.displacement(points)


@jax.tree_util.register_pytree_node_class
class CompositeTransform(Transform):
    """ITK-convention composite: last-added transform is applied first.

    ``CompositeTransform([A, B]).apply(p) == A(B(p))``.
    """

    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = tuple(transforms)

    def tree_flatten(self):
        return (self.transforms,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def apply(self, points):
        p = points
        for t in reversed(self.transforms):
            p = t.apply(p)
        return p

    def is_linear(self):
        return all(t.is_linear() for t in self.transforms)

    def as_matrix(self):
        m = np.eye(4)
        for t in reversed(self.transforms):
            m = t.as_matrix() @ m
        return m

    def flatten(self):
        out = []
        for t in self.transforms:
            if isinstance(t, CompositeTransform):
                out.extend(t.flatten())
            else:
                out.append(t)
        return out


# ---------------------------------------------------------------------------
# initialisation (ITK CenteredTransformInitializer analogue)
# ---------------------------------------------------------------------------

def centered_transform_initializer(
    fixed_image,
    moving_image,
    transform_type: str = "euler",
    moments: bool = False,
):
    """Initialise a rigid transform aligning image centres.

    GEOMETRY mode (moments=False): translation = geometric centre of moving −
    geometric centre of fixed; centre = geometric centre of fixed.
    MOMENTS mode: uses intensity centres of mass instead (ITK's moments
    initializer sets translation from first moments only).

    Mirrors ``sitk.CenteredTransformInitializer`` as used at
    /root/reference/platipy/imaging/registration/linear.py:129 and :42.
    """
    if moments:
        c_fixed = _center_of_mass(fixed_image)
        c_moving = _center_of_mass(moving_image)
        center = c_fixed
    else:
        c_fixed = _geometric_center(fixed_image)
        c_moving = _geometric_center(moving_image)
        center = c_fixed
    translation = np.asarray(c_moving) - np.asarray(c_fixed)
    if transform_type in ("euler", "rigid"):
        return Euler3DTransform(
            angles=np.zeros(3, np.float32),
            translation=np.asarray(translation, dtype=np.float32),
            center=np.asarray(center, dtype=np.float32),
        )
    if transform_type == "versor":
        return VersorRigid3DTransform(
            versor=np.zeros(3, np.float32),
            translation=np.asarray(translation, dtype=np.float32),
            center=np.asarray(center, dtype=np.float32),
        )
    raise ValueError(transform_type)


def _geometric_center(image) -> np.ndarray:
    """Physical centre of the image volume (continuous index (n-1)/2)."""
    n = np.asarray(image.size, dtype=np.float64)
    return image.physical_point((n - 1) / 2.0)


def _center_of_mass(image) -> np.ndarray:
    """Intensity-weighted physical centre of mass (host-side)."""
    arr = np.asarray(image.array, dtype=np.float64)
    total = arr.sum()
    if total == 0:
        return _geometric_center(image)
    nz, ny, nx = arr.shape[:3]
    iz = np.arange(nz, dtype=np.float64)
    iy = np.arange(ny, dtype=np.float64)
    ix = np.arange(nx, dtype=np.float64)
    mz = (arr.sum(axis=(1, 2)) * iz).sum() / total
    my = (arr.sum(axis=(0, 2)) * iy).sum() / total
    mx = (arr.sum(axis=(0, 1)) * ix).sum() / total
    return image.physical_point((mx, my, mz))
