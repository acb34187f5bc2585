"""Euclidean distance transforms on device.

TPU-native replacement for ITK's ``SignedMaurerDistanceMapImageFilter``
(reference call sites: registration/utils.py:289, label/comparison.py:56-100,
utils/conduction.py:39).

Algorithm: exact separable EDT via per-axis min-plus convolution with the
parabolic cost ``(d * spacing)^2`` — the vectorised equivalent of
Maurer/Felzenszwalb.  Each axis pass is a bounded ``fori_loop`` of shifted
elementwise minima: O(n) fused VPU sweeps over the volume, no data-dependent
control flow, fully jit/vmap/shard_map compatible.  ``max_distance_vox`` bounds
the sweep for morphology-style queries (dilate-by-r needs only r voxels).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image

__all__ = [
    "squared_edt",
    "edt",
    "signed_maurer_distance_map",
    "polyline_distance2",
]

_INF = 1e10


def _edt_pass(fsq: jnp.ndarray, axis: int, spacing: float, max_offset: Optional[int] = None):
    """One min-plus parabolic pass: out[i] = min_j fsq[j] + ((i-j)*spacing)^2."""
    n = fsq.shape[axis]
    w = n - 1 if max_offset is None else int(min(n - 1, max_offset))
    if w <= 0:
        return fsq
    pad = [(0, 0)] * fsq.ndim
    pad[axis] = (w, w)
    padded = jnp.pad(fsq, pad, constant_values=_INF)
    s2 = float(spacing) ** 2

    def body(d, acc):
        off = d - w
        shifted = jax.lax.dynamic_slice_in_dim(padded, d, n, axis)
        cost = shifted + (off.astype(fsq.dtype) ** 2) * s2
        return jnp.minimum(acc, cost)

    init = jnp.full_like(fsq, _INF)
    return jax.lax.fori_loop(0, 2 * w + 1, body, init)


def squared_edt(
    mask: jnp.ndarray,
    spacing_xyz=(1.0, 1.0, 1.0),
    max_distance_vox: Optional[int] = None,
) -> jnp.ndarray:
    """Squared Euclidean distance from each voxel to the nearest True voxel.

    ``mask`` is [z,y,x] bool/int; spacing in (x,y,z).  Voxels inside the mask
    get 0.  If the mask is empty everything is ~_INF.
    """
    s = np.asarray(spacing_xyz, dtype=np.float64).reshape(-1)
    if s.size == 1:
        s = np.repeat(s, 3)
    return _squared_edt_jit(
        jnp.asarray(mask),
        spacing_key=tuple(float(v) for v in s),
        max_distance_vox=None if max_distance_vox is None else int(max_distance_vox),
    )


@partial(jax.jit, static_argnames=("spacing_key", "max_distance_vox"))
def _squared_edt_jit(mask, *, spacing_key, max_distance_vox):
    s = spacing_key
    m = mask > 0
    fsq = jnp.where(m, 0.0, _INF).astype(jnp.float32)
    fsq = _edt_pass(fsq, 2, s[0], max_distance_vox)  # x
    fsq = _edt_pass(fsq, 1, s[1], max_distance_vox)  # y
    fsq = _edt_pass(fsq, 0, s[2], max_distance_vox)  # z
    return fsq


def edt(mask, spacing_xyz=(1.0, 1.0, 1.0), max_distance_vox: Optional[int] = None):
    """Euclidean distance to the nearest True voxel (scipy ``distance_transform_edt``
    of the inverted mask, i.e. distances measured *outside* the mask)."""
    return jnp.sqrt(squared_edt(mask, spacing_xyz, max_distance_vox))


def _next_bucket(n: int, step: int, minimum: int) -> int:
    return max(minimum, int(np.ceil(n / step)) * step)


@partial(jax.jit, static_argnames=("box_shape", "tile"))
def _polyline_dist2_jit(box_origin, spacing, seg_a, seg_ab, *, box_shape, tile):
    """Min squared distance from every voxel of a box grid to a segment set.

    seg_a/seg_ab: [S,3] segment starts / direction vectors in CENTRED mm
    coordinates (padded segments carry far-away starts so they never win the
    min).  Two [T,3]x[3,S] matmuls per voxel tile put the inner product on
    the MXU; HIGHEST precision because mm coordinates need f32.
    """
    nz, ny, nx = box_shape
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(nz, dtype=jnp.float32),
        jnp.arange(ny, dtype=jnp.float32),
        jnp.arange(nx, dtype=jnp.float32),
        indexing="ij",
    )
    px = box_origin[0] + xx * spacing[0]
    py = box_origin[1] + yy * spacing[1]
    pz = box_origin[2] + zz * spacing[2]
    pts = jnp.stack([px.ravel(), py.ravel(), pz.ravel()], axis=-1)  # [V,3]
    n_vox = pts.shape[0]
    n_pad = int(np.ceil(n_vox / tile)) * tile
    pts = jnp.pad(pts, ((0, n_pad - n_vox), (0, 0)))

    ab2 = jnp.maximum(jnp.sum(seg_ab * seg_ab, axis=-1), 1e-12)       # [S]
    a_ab = jnp.sum(seg_a * seg_ab, axis=-1)                           # [S]
    a2 = jnp.sum(seg_a * seg_a, axis=-1)                              # [S]
    prec = jax.lax.Precision.HIGHEST

    def tile_min(p):  # p: [T,3]
        pa = jnp.dot(p, seg_a.T, precision=prec)                      # [T,S]
        pab = jnp.dot(p, seg_ab.T, precision=prec)                    # [T,S]
        p2 = jnp.sum(p * p, axis=-1, keepdims=True)                   # [T,1]
        num = pab - a_ab[None, :]
        t = jnp.clip(num / ab2[None, :], 0.0, 1.0)
        d2 = p2 - 2.0 * pa + a2[None, :] - 2.0 * t * num + t * t * ab2[None, :]
        return jnp.min(d2, axis=-1)                                   # [T]

    d2 = jax.lax.map(tile_min, pts.reshape(-1, tile, 3)).ravel()[:n_vox]
    return jnp.maximum(d2, 0.0).reshape(box_shape)


def polyline_distance2(
    points_mm,
    shape_zyx,
    origin_xyz,
    spacing_xyz,
    max_distance_mm: float,
):
    """EXACT squared distance to a polyline, on a bounded box of the volume.

    Replaces seed-voxel-EDT tube stencilling (which quantises the centreline
    to voxel centres — up to half a voxel of systematic radius error) with
    true point-to-segment distances.  Returns a full [z,y,x] f32 volume:
    exact d^2 inside the polyline's bounding box (+``max_distance_mm``
    margin), ~_INF outside it.  Identity-direction geometry (origin +
    spacing * index), like the reference's VTK tube path
    (reference utils/vessel.py:393-434).

    Box dims snap up to multiples of 8 and the segment count pads to a
    power-of-two bucket, so repeated calls on similar vessels reuse one or
    two compiled programs.
    """
    pts = np.asarray(points_mm, dtype=np.float64).reshape(-1, 3)
    origin = np.asarray(origin_xyz, dtype=np.float64)
    spacing = np.asarray(spacing_xyz, dtype=np.float64)
    nz, ny, nx = (int(v) for v in shape_zyx)
    out_far = jnp.full((nz, ny, nx), _INF, jnp.float32)
    if pts.shape[0] == 0:
        return out_far
    if pts.shape[0] == 1:
        pts = np.concatenate([pts, pts], axis=0)

    # bounding box in index space (points are x,y,z; volume is [z,y,x])
    margin = float(max_distance_mm) + spacing.max()
    idx_lo = (pts.min(axis=0) - margin - origin) / spacing
    idx_hi = (pts.max(axis=0) + margin - origin) / spacing
    lo = np.maximum(np.floor(idx_lo).astype(int), 0)          # (x,y,z)
    hi = np.minimum(np.ceil(idx_hi).astype(int) + 1, [nx, ny, nz])
    if np.any(hi <= lo):
        return out_far
    ext = hi - lo
    # snap sizes UP to multiples of 8 (shift lo down at the far boundary)
    for k, dim in enumerate((nx, ny, nz)):
        want = min(_next_bucket(int(ext[k]), 8, 8), dim)
        lo[k] = min(lo[k], dim - want)
        hi[k] = lo[k] + want
    box_shape = (int(hi[2] - lo[2]), int(hi[1] - lo[1]), int(hi[0] - lo[0]))

    centre = origin + spacing * (lo + hi) / 2.0
    box_origin = origin + spacing * lo - centre
    a = (pts[:-1] - centre).astype(np.float32)
    ab = (pts[1:] - pts[:-1]).astype(np.float32)
    n_seg = a.shape[0]
    s_pad = 64
    while s_pad < n_seg:
        s_pad *= 2
    if s_pad > n_seg:
        far = np.full((s_pad - n_seg, 3), 1e6, np.float32)
        a = np.concatenate([a, far], axis=0)
        ab = np.concatenate([ab, np.zeros((s_pad - n_seg, 3), np.float32)], axis=0)

    d2_box = _polyline_dist2_jit(
        jnp.asarray(box_origin, jnp.float32),
        jnp.asarray(spacing, jnp.float32),
        jnp.asarray(a),
        jnp.asarray(ab),
        box_shape=box_shape,
        tile=8192,
    )
    return jax.lax.dynamic_update_slice(
        out_far, d2_box, (int(lo[2]), int(lo[1]), int(lo[0]))
    )


@partial(jax.jit, static_argnames=("m_chunk", "k_tile"))
def _min_dist2_point_sets_jit(query, sets, *, m_chunk, k_tile):
    """[N, M] min squared distance from each query point to each point set.

    query: [M, 3] mm; sets: [N, K, 3] mm (padded entries carry far-away
    coordinates so they never win the min).  Tiled lax.map/fori so the
    working set stays ~m_chunk*k_tile floats regardless of M*K.
    """
    m = query.shape[0]
    k = sets.shape[1]
    chunks = query.reshape(m // m_chunk, m_chunk, 3)

    def one_set(pts):  # [K, 3]
        def one_chunk(q):  # [m_chunk, 3]
            def body(i, run):
                tile = jax.lax.dynamic_slice(pts, (i * k_tile, 0), (k_tile, 3))
                d2 = jnp.sum(
                    (q[:, None, :] - tile[None, :, :]) ** 2, axis=-1
                )  # [m_chunk, k_tile]
                return jnp.minimum(run, jnp.min(d2, axis=1))

            run0 = jnp.full((m_chunk,), jnp.inf, jnp.float32)
            return jax.lax.fori_loop(0, k // k_tile, body, run0)

        return jax.lax.map(one_chunk, chunks).reshape(m)

    return jax.lax.map(one_set, sets)


def min_distance_to_point_sets(query_pts_mm, point_sets_mm,
                               m_chunk: int = 4096, k_tile: int = 8192):
    """Exact min DISTANCE (mm) from M query points to each of N point sets.

    The surface-sampling core of iterative atlas removal: the reference takes
    a Maurer distance map of every test atlas's contour and samples it at the
    consensus surface (reference label/iar.py:131-156 via projection.py) —
    one full-volume C++ EDT per atlas per recursion round.  Distance from a
    voxel centre to the nearest contour-voxel centre IS a nearest-point query,
    so here it runs as ONE device program over all atlases (pure VPU
    broadcast-min; no EDT volumes at all).

    query_pts_mm: [M, 3]; point_sets_mm: list of [K_i, 3] arrays.  Sizes pad
    to buckets (m_chunk / k_tile multiples) so repeated calls reuse compiled
    programs; padded query rows are dropped, padded set points are banished
    to 1e7 mm.  An EMPTY point set returns inf for every query.  [N, M] np.
    """
    query = np.asarray(query_pts_mm, np.float32).reshape(-1, 3)
    m = query.shape[0]
    if m == 0:
        return np.zeros((len(point_sets_mm), 0), np.float32)
    k_max = max((np.asarray(p).shape[0] for p in point_sets_mm), default=0)
    m_pad = _next_bucket(m, m_chunk, m_chunk)
    k_pad = _next_bucket(max(k_max, 1), k_tile, k_tile)
    query_p = np.full((m_pad, 3), 1e7, np.float32)
    query_p[:m] = query
    sets = np.full((len(point_sets_mm), k_pad, 3), 1e7, np.float32)
    for i, p in enumerate(point_sets_mm):
        p = np.asarray(p, np.float32).reshape(-1, 3)
        sets[i, : p.shape[0]] = p
    d2 = np.asarray(
        _min_dist2_point_sets_jit(
            jnp.asarray(query_p), jnp.asarray(sets),
            m_chunk=m_chunk, k_tile=k_tile,
        )
    )[:, :m]
    out = np.sqrt(d2, dtype=np.float32)
    for i, p in enumerate(point_sets_mm):
        if np.asarray(p).shape[0] == 0:
            out[i] = np.inf
    return out


def signed_maurer_distance_map(
    mask_image: Image,
    inside_is_positive: bool = False,
    squared_distance: bool = False,
    use_image_spacing: bool = True,
    max_distance_vox: Optional[int] = None,
) -> Image:
    """``sitk.SignedMaurerDistanceMap`` analogue.

    ITK convention (verified against the reference's surface-metric goldens,
    test_metrics.py:52): the magnitude is the distance to the mask's *inner
    boundary voxels* (the contour — mask voxels with a face-adjacent
    background neighbour), zero on the contour itself, negative inside.
    For outside voxels this equals the distance to the nearest inside voxel.
    """
    from platipy_tpu.core.morphology import label_contour

    m = mask_image.array > 0
    contour = label_contour(m) > 0
    spacing = mask_image.spacing if use_image_spacing else (1.0, 1.0, 1.0)
    d_sq = squared_edt(contour, spacing, max_distance_vox)
    if squared_distance:
        signed = jnp.where(m & ~contour, -d_sq, d_sq)
    else:
        d = jnp.sqrt(d_sq)
        signed = jnp.where(m & ~contour, -d, d)
    if inside_is_positive:
        signed = -signed
    return mask_image.with_array(signed.astype(jnp.float32))
