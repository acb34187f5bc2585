"""TPU-native image model.

The reference (platipy) passes ``SimpleITK.Image`` objects everywhere; the physical
metadata (origin, spacing, direction) carried by those objects is part of the API
contract (see /root/reference/platipy/imaging/registration/utils.py:148-192 for the
reference-image resampling semantics).  Here the equivalent is an :class:`Image`
pytree: a JAX array plus physical metadata, usable directly inside ``jit`` /
``shard_map`` and differentiable end-to-end.

Conventions (mirroring SimpleITK so the public API stays drop-in compatible):

* ``array`` is indexed ``[z, y, x]`` (numpy order, what ``sitk.GetArrayFromImage``
  returns).
* ``origin``, ``spacing`` are length-3 in **(x, y, z)** order; ``direction`` is the
  3x3 row-major direction-cosine matrix in (x, y, z) order — identical to
  ``sitk.Image.GetOrigin()/GetSpacing()/GetDirection()``.
* physical point of index (i_x, i_y, i_z):  ``p = origin + direction @ (spacing * i)``.

The metadata lives as *auxiliary* (static) data on the pytree by default so that a
jit-compiled pipeline specialises on grid geometry (shapes are static under XLA
anyway); helper functions also accept plain arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Image",
    "from_array",
    "like",
    "index_to_physical_matrix",
    "physical_to_index_matrix",
]


def _as_tuple3(v, name: str) -> Tuple[float, float, float]:
    arr = np.asarray(v, dtype=np.float64).reshape(-1)
    if arr.size == 1:
        arr = np.repeat(arr, 3)
    if arr.size != 3:
        raise ValueError(f"{name} must have 3 elements, got {arr.size}")
    return tuple(float(x) for x in arr)


def _as_direction(v) -> Tuple[float, ...]:
    arr = np.asarray(v, dtype=np.float64).reshape(-1)
    if arr.size != 9:
        raise ValueError("direction must have 9 elements (3x3 row-major)")
    return tuple(float(x) for x in arr)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Image:
    """A 3-D scalar (or vector) image on a physical grid.

    ``array``: jnp.ndarray, shape [z, y, x] (scalar) or [z, y, x, c] (vector,
    e.g. a displacement field with c=3 in (x, y, z) component order — matching
    ``sitk.TransformToDisplacementField`` output layout).
    """

    array: jnp.ndarray
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    direction: Tuple[float, ...] = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        return (self.array,), (self.origin, self.spacing, self.direction)

    @classmethod
    def tree_unflatten(cls, aux, children):
        origin, spacing, direction = aux
        return cls(children[0], origin, spacing, direction)

    # -- constructors ---------------------------------------------------------
    def __post_init__(self):
        object.__setattr__(self, "origin", _as_tuple3(self.origin, "origin"))
        object.__setattr__(self, "spacing", _as_tuple3(self.spacing, "spacing"))
        object.__setattr__(self, "direction", _as_direction(self.direction))

    # -- basic geometry (SimpleITK-compatible accessors) ----------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        """Array shape [z, y, x(, c)]."""
        return tuple(self.array.shape)

    @property
    def spatial_shape(self) -> Tuple[int, int, int]:
        """Spatial shape [z, y, x]."""
        return tuple(self.array.shape[:3])

    @property
    def size(self) -> Tuple[int, int, int]:
        """Grid size in (x, y, z) order — ``sitk.Image.GetSize()``."""
        z, y, x = self.array.shape[:3]
        return (x, y, z)

    @property
    def ndim_components(self) -> int:
        return 0 if self.array.ndim == 3 else self.array.shape[-1]

    @property
    def dtype(self):
        return self.array.dtype

    @property
    def direction_matrix(self) -> np.ndarray:
        return np.asarray(self.direction, dtype=np.float64).reshape(3, 3)

    @property
    def spacing_zyx(self) -> Tuple[float, float, float]:
        s = self.spacing
        return (s[2], s[1], s[0])

    # -- physical <-> index mapping -------------------------------------------
    def index_to_physical_matrix(self) -> np.ndarray:
        """4x4 homogeneous matrix mapping (x,y,z) *index* -> physical point."""
        return index_to_physical_matrix(self.origin, self.spacing, self.direction)

    def physical_to_index_matrix(self) -> np.ndarray:
        return physical_to_index_matrix(self.origin, self.spacing, self.direction)

    def physical_point(self, index_xyz) -> np.ndarray:
        """Physical point of a (possibly fractional) (x,y,z) index (host-side)."""
        m = self.index_to_physical_matrix()
        idx = np.asarray(index_xyz, dtype=np.float64)
        return m[:3, :3] @ idx + m[:3, 3]

    def physical_extent(self) -> np.ndarray:
        """Physical size (mm) along each (x,y,z) axis: (n-1)*spacing."""
        n = np.asarray(self.size, dtype=np.float64)
        return (n - 1) * np.asarray(self.spacing)

    # -- convenience ----------------------------------------------------------
    def with_array(self, array: jnp.ndarray) -> "Image":
        """Same grid, new voxel data (``sitk`` ``CopyInformation`` analogue)."""
        return Image(array, self.origin, self.spacing, self.direction)

    def astype(self, dtype) -> "Image":
        return self.with_array(self.array.astype(dtype))

    def numpy(self) -> np.ndarray:
        return np.asarray(self.array)

    def same_grid_as(self, other: "Image", tol: float = 1e-5) -> bool:
        return (
            self.spatial_shape == other.spatial_shape
            and np.allclose(self.origin, other.origin, atol=tol)
            and np.allclose(self.spacing, other.spacing, atol=tol)
            and np.allclose(self.direction, other.direction, atol=tol)
        )

    def __repr__(self):
        return (
            f"Image(shape={self.shape}, dtype={self.array.dtype}, "
            f"origin={tuple(round(o, 3) for o in self.origin)}, "
            f"spacing={tuple(round(s, 3) for s in self.spacing)})"
        )

    # -- sitk-style elementwise arithmetic (metadata-preserving) ---------------
    def _binop(self, other, op):
        other_arr = other.array if isinstance(other, Image) else other
        return self.with_array(op(self.array, other_arr))

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    def __radd__(self, other):
        # supports sum([...]) which starts from 0
        return self._binop(other, lambda a, b: b + a)

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._binop(other, lambda a, b: b - a)

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b)

    def __rmul__(self, other):
        return self._binop(other, lambda a, b: b * a)

    def __truediv__(self, other):
        return self._binop(other, lambda a, b: a / b)

    def __pow__(self, other):
        return self._binop(other, lambda a, b: a**b)

    def __neg__(self):
        return self.with_array(-self.array)

    def __gt__(self, other):
        return self._binop(other, lambda a, b: (a > b).astype(jnp.uint8))

    def __ge__(self, other):
        return self._binop(other, lambda a, b: (a >= b).astype(jnp.uint8))

    def __lt__(self, other):
        return self._binop(other, lambda a, b: (a < b).astype(jnp.uint8))

    def __le__(self, other):
        return self._binop(other, lambda a, b: (a <= b).astype(jnp.uint8))

    def __abs__(self):
        return self.with_array(jnp.abs(self.array))


def index_to_physical_matrix(origin, spacing, direction) -> np.ndarray:
    """4x4 homogeneous: physical = direction @ diag(spacing) @ index_xyz + origin."""
    d = np.asarray(direction, dtype=np.float64).reshape(3, 3)
    s = np.asarray(spacing, dtype=np.float64).reshape(3)
    o = np.asarray(origin, dtype=np.float64).reshape(3)
    m = np.eye(4)
    m[:3, :3] = d * s[None, :]
    m[:3, 3] = o
    return m


def physical_to_index_matrix(origin, spacing, direction) -> np.ndarray:
    return np.linalg.inv(index_to_physical_matrix(origin, spacing, direction))


def from_array(
    array,
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
    direction=(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
    dtype=None,
) -> Image:
    arr = jnp.asarray(array)
    if dtype is not None:
        arr = arr.astype(dtype)
    return Image(arr, origin, spacing, direction)


def like(array, reference: Image) -> Image:
    """New image with ``reference``'s grid metadata."""
    return Image(jnp.asarray(array), reference.origin, reference.spacing, reference.direction)
