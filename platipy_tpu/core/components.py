"""Connected components, relabelling, region growing, and shape statistics.

TPU-native replacements for ITK's ``ConnectedComponent`` / ``RelabelComponent``
/ ``ConnectedThreshold`` / ``LabelShapeStatisticsImageFilter`` (reference call
sites: label/fusion.py:314-320, projects/bronchus/bronchus.py:162-316,
utils/crop.py:44-46).

Connected components run as an on-device label-propagation fixpoint (each voxel
starts with its linear index; iterated neighbourhood-max under a while_loop).
Convergence is in O(diameter) fused VPU sweeps — data stays on device, no
host round-trip.  Statistics are pure reductions (segment_sum / moments).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image

__all__ = [
    "connected_components",
    "relabel_components",
    "keep_largest_component",
    "keep_largest_component_stack",
    "keep_largest_component_stack_device",
    "fill_and_largest_component_stack_device",
    "connected_threshold",
    "label_shape_statistics",
    "get_union_mask",
]


def _neighbor_max(lab: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    padded = jnp.pad(lab, 1, constant_values=0)
    shape = lab.shape
    out = lab
    if connectivity == 6:
        offsets = [(0, 1, 1), (2, 1, 1), (1, 0, 1), (1, 2, 1), (1, 1, 0), (1, 1, 2)]
    else:
        offsets = [
            (dz, dy, dx)
            for dz in range(3)
            for dy in range(3)
            for dx in range(3)
            if not (dz == 1 and dy == 1 and dx == 1)
        ]
    for off in offsets:
        out = jnp.maximum(out, jax.lax.dynamic_slice(padded, off, shape))
    return out


def connected_components(mask, connectivity: int = 26, max_iterations: int = 4096,
                         use_native: bool = True):
    """Label connected components of a binary mask.

    Returns int32 labels (0 = background).  Labels are *not* consecutive —
    follow with :func:`relabel_components` for ITK ``RelabelComponent``
    semantics (consecutive labels sorted by size, descending).

    ITK's ``ConnectedComponent`` uses full (26) connectivity by default
    behaviourally relevant to the reference's use in fusion/bronchus.

    ``use_native``: route through the C++ union-find (single O(N) pass) when
    available; the on-device label-propagation fixpoint is the fallback and
    the only path under jit/vmap.
    """
    m, img = _unwrap(mask)
    if use_native:
        from platipy_tpu import native

        if native.available():
            labels = native.cc_label_3d(np.asarray(m), connectivity)
            return _rewrap_int(jnp.asarray(labels), img)
    n = m.size
    init = jnp.where(
        m, jnp.arange(1, n + 1, dtype=jnp.int32).reshape(m.shape), 0
    )

    def cond(state):
        lab, changed, it = state
        return changed & (it < max_iterations)

    def body(state):
        lab, _, it = state
        # two propagation steps per check to amortise the convergence test;
        # each step MUST be re-masked or labels bleed across 1-voxel gaps
        new = jnp.where(m, _neighbor_max(lab, connectivity), 0)
        new = jnp.where(m, _neighbor_max(new, connectivity), 0)
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (init, jnp.array(True), 0))
    return _rewrap_int(lab, img)


def relabel_components(labels, sort_by_size: bool = True, minimum_object_size: int = 0):
    """Consecutive labels 1..K sorted by size descending (ITK RelabelComponent)."""
    lab, img = _unwrap_int(labels)
    lab_np = np.asarray(lab)
    uniq, counts = np.unique(lab_np, return_counts=True)
    fg = uniq > 0
    uniq, counts = uniq[fg], counts[fg]
    if uniq.size == 0:
        return _rewrap_int(jnp.zeros_like(lab), img)
    order = np.argsort(-counts, kind="stable") if sort_by_size else np.arange(uniq.size)
    new_labels = np.zeros(uniq.size, dtype=np.int32)
    next_label = 1
    for idx in order:
        if minimum_object_size > 0 and counts[idx] < minimum_object_size:
            new_labels[idx] = 0
        else:
            new_labels[idx] = next_label
            next_label += 1
    # vectorised remap: bucket of each voxel in sorted uniq (+sentinel for bg)
    lut = np.concatenate([[0], new_labels])
    bucket = np.searchsorted(uniq, lab_np)
    bucket = np.where(
        (lab_np > 0) & (bucket < uniq.size) & (uniq[np.minimum(bucket, uniq.size - 1)] == lab_np),
        bucket + 1,
        0,
    )
    mapped = lut[bucket]
    return _rewrap_int(jnp.asarray(mapped), img)


def keep_largest_component(mask, connectivity: int = 26):
    """Binary mask of the largest connected component.

    One host round trip total: with the native C++ labeller the mask is
    pulled once, labelled + reduced entirely in host memory, and the binary
    result pushed once (the earlier device-hosted label volume cost two
    extra full-volume transfers over a remote-device tunnel).
    """
    m, img = _unwrap(mask)
    from platipy_tpu import native

    if native.available():
        m_np = np.asarray(m)                       # pull (once)
        labels = native.cc_label_3d(m_np, connectivity)
        flat = labels.reshape(-1)
        counts = np.bincount(flat[flat > 0]) if flat.any() else np.zeros(1, int)
        if counts.size == 0 or counts.max() == 0:
            out = np.zeros_like(labels, dtype=np.int32)
        else:
            out = (labels == int(counts.argmax())).astype(np.int32)
        return _rewrap_int(jnp.asarray(out), img)  # push (once)

    lab = connected_components(mask, connectivity, use_native=False)
    lab_arr = lab.array if isinstance(lab, Image) else lab
    lab_np = np.asarray(lab_arr).reshape(-1)
    counts = np.bincount(lab_np[lab_np > 0]) if lab_np.any() else np.zeros(1, int)
    if counts.size == 0 or counts.max() == 0:
        return _rewrap_int(jnp.zeros_like(lab_arr), img)
    largest = int(counts.argmax())
    out = (lab_np == largest).astype(np.int32).reshape(np.shape(lab_arr))
    return _rewrap_int(jnp.asarray(out), img)


def keep_largest_component_stack(stack, connectivity: int = 26) -> jnp.ndarray:
    """Largest connected component of every mask in a [S,z,y,x] stack with
    ONE stacked device pull and ONE push (the per-mask form pays a
    latency-bound round trip pair per structure over a remote-device link).

    Returns a uint8 [S,z,y,x] device array.
    """
    stack_np = np.asarray(jnp.asarray(stack) > 0).astype(np.uint8)  # one pull
    from platipy_tpu import native

    out = np.zeros_like(stack_np)

    def one(k):
        m_np = stack_np[k]
        if not m_np.any():
            return
        if native.available():
            labels = native.cc_label_3d(m_np, connectivity)
        else:
            labels = np.asarray(
                connected_components(jnp.asarray(m_np), connectivity,
                                     use_native=False)
            )
        flat = labels.reshape(-1)
        counts = np.bincount(flat[flat > 0]) if flat.any() else np.zeros(1, int)
        if counts.size and counts.max() > 0:
            out[k] = (labels == int(counts.argmax())).astype(np.uint8)

    # ctypes releases the GIL: structures label in parallel host threads
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, stack_np.shape[0])) as pool:
        list(pool.map(one, range(stack_np.shape[0])))
    return jnp.asarray(out)  # one push


# ---------------------------------------------------------------------------
# fully on-device fill-holes + keep-largest (batched, jit/vmap-safe)
#
# The host path (native BFS fill + union-find CC) costs ~0.3 s per volume of
# single-core host time — ~3 s for a 10-atlas IAR round on this image's
# 1-core host.  Here both are propagation fixpoints computed with SEGMENTED
# SCANS: within each contiguous run of a 1-D line, a log-depth associative
# scan spreads the run minimum (labels) or maximum (reachability) in one
# pass, so one round = 3 axes x 2 directions instead of O(run-length)
# neighbour dilations.  A 26-neighbourhood min between rounds carries labels
# across diagonal connections.  Convergence is in O(geodesic turn count):
# 2-6 rounds for anatomical masks (vs ~100+ single-voxel dilations).
# ---------------------------------------------------------------------------

def _shift_along(arr, axis: int, offset: int, fill):
    """Shift ``arr`` so out[i] = arr[i - offset] along ``axis`` (fill at the
    vacated face)."""
    n = arr.shape[axis]
    if offset > 0:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, n - offset)
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (offset, 0)
    else:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(-offset, n)
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (0, -offset)
    return jnp.pad(arr[tuple(sl)], pad, constant_values=fill)


def _segmented_run_reduce(v, mask, axis: int, kind: str):
    """Spread each contiguous ``mask`` run's min (kind="min") or max
    (kind="or") of ``v`` to every voxel of the run, along ``axis``.

    Forward + backward ``lax.scan`` (prefix/suffix within run): the scan
    body is traced ONCE regardless of axis length, keeping the compiled
    program small — an associative_scan formulation unrolls ~2 log(n)
    slicing stages per scan and pushed the whole fill+largest program past
    the remote compile service's patience at clinical volume shapes."""
    if kind == "min":
        neutral = jnp.asarray(jnp.iinfo(v.dtype).max, v.dtype)
        red = jnp.minimum
    else:
        neutral = jnp.asarray(0, v.dtype)
        red = jnp.maximum
    vm = jnp.moveaxis(jnp.where(mask, v, neutral), axis, 0)
    mm = jnp.moveaxis(mask, axis, 0)

    def step(carry, xs):
        pv, pm = carry
        vi, mi = xs
        acc = jnp.where(mi & pm, red(pv, vi), jnp.where(mi, vi, neutral))
        return (acc, mi), acc

    init = (jnp.full_like(vm[0], neutral), jnp.zeros_like(mm[0]))
    _, fwd = jax.lax.scan(step, init, (vm, mm))
    _, bwd = jax.lax.scan(step, init, (vm, mm), reverse=True)
    out = red(fwd, bwd)
    return jnp.moveaxis(jnp.where(mm, out, neutral), 0, axis)


def _neighbor_min26(lab, mask, neutral):
    nb = jax.lax.reduce_window(
        jnp.where(mask, lab, neutral), neutral, jax.lax.min,
        (1, 3, 3, 3), (1, 1, 1, 1), "SAME",
    )
    return jnp.where(mask, jnp.minimum(lab, nb), neutral)


def _fill_holes_stack_jit(mask, max_rounds: int):
    """Background reachability from the border, batched [N,z,y,x] bool
    (6-connectivity, matching the native fill) -> filled mask."""
    bg = ~mask
    border = jnp.zeros(mask.shape, bool)
    for axis in (1, 2, 3):
        sl = [slice(None)] * 4
        sl[axis] = slice(0, 1)
        border = border.at[tuple(sl)].set(True)
        sl[axis] = slice(-1, None)
        border = border.at[tuple(sl)].set(True)
    reached = (border & bg).astype(jnp.int32)

    def body(state):
        r, _, it = state
        new = r
        for axis in (1, 2, 3):
            new = _segmented_run_reduce(new, bg, axis, "or")
        return new, jnp.any(new != r), it + 1

    reached, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_rounds), body,
        (reached, jnp.array(True), 0),
    )
    return mask | (bg & ~(reached > 0))


def _largest_component_stack_jit(mask, max_rounds: int):
    """Keep the largest 26-connected component of each mask in [N,z,y,x]."""
    n = mask.shape[0]
    vol = mask.shape[1] * mask.shape[2] * mask.shape[3]
    neutral = jnp.asarray(vol, jnp.int32)
    iota = jnp.arange(vol, dtype=jnp.int32).reshape(mask.shape[1:])[None]
    lab = jnp.where(mask, jnp.broadcast_to(iota, mask.shape), neutral)

    def body(state):
        l, _, it = state
        new = _neighbor_min26(l, mask, neutral)
        for axis in (1, 2, 3):
            new = _segmented_run_reduce(new, mask, axis, "min")
        return new, jnp.any(new != l), it + 1

    lab, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_rounds), body,
        (lab, jnp.array(True), 0),
    )

    # modal label per atlas WITHOUT a big scatter (TPU scatter-adds with
    # millions of colliding indices are slow): sort, then run lengths from
    # run-start positions via cummax
    flat = lab.reshape(n, -1)

    def modal(l):
        s = jnp.sort(l)
        idx = jnp.arange(l.shape[0], dtype=jnp.int32)
        is_start = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
        run_start = jax.lax.cummax(jnp.where(is_start, idx, -1))
        is_end = jnp.concatenate([s[1:] != s[:-1], jnp.array([True])])
        run_len = idx - run_start + 1
        cand = jnp.where(is_end & (s < vol), run_len, -1)
        return s[jnp.argmax(cand)]

    best = jax.vmap(modal)(flat)
    return mask & (lab == best[:, None, None, None].astype(lab.dtype))


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def keep_largest_component_stack_device(stack, max_rounds: int = 256):
    """Batched keep-largest (26-connected, NO hole fill) of a [N,z,y,x]
    binary stack, entirely on device — the device-side analogue of
    :func:`keep_largest_component_stack` (whose host pull + single-core CC
    + push costs ~0.2 s per structure on this image's 1-core host)."""
    m = jnp.asarray(stack) > 0
    return _largest_component_stack_jit(m, max_rounds).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def fill_and_largest_component_stack_device(stack, max_rounds: int = 256):
    """Batched fill-holes (6-connected background) + keep-largest
    (26-connected) of a [N,z,y,x] binary stack, entirely on device — the
    device-side analogue of ``label.fusion.fill_and_largest_component_np``
    (the post-threshold tail of ``process_probability_image``,
    reference fusion.py:295-328).  Returns uint8."""
    m = jnp.asarray(stack) > 0
    filled = _fill_holes_stack_jit(m, max_rounds)
    return _largest_component_stack_jit(filled, max_rounds).astype(jnp.uint8)


def connected_threshold(image, seeds, lower: float, upper: float, connectivity: int = 6,
                        max_iterations: int = 4096):
    """``sitk.ConnectedThreshold`` analogue: region growing from seed points.

    ``seeds`` is a list of (x, y, z) integer indices.  Grows through voxels
    whose intensity lies in [lower, upper].
    """
    arr = image.array if isinstance(image, Image) else jnp.asarray(image)
    img = image if isinstance(image, Image) else None

    from platipy_tpu import native

    if native.available():
        seeds_zyx = [(int(sz), int(sy), int(sx)) for (sx, sy, sz) in seeds]
        grown = native.region_grow_3d(
            np.asarray(arr), seeds_zyx, float(lower), float(upper), connectivity
        )
        return _rewrap_int(jnp.asarray(grown), img)

    allowed = (arr >= lower) & (arr <= upper)
    seed_mask = jnp.zeros(arr.shape, dtype=bool)
    for (sx, sy, sz) in seeds:
        seed_mask = seed_mask.at[int(sz), int(sy), int(sx)].set(True)
    seed_mask = seed_mask & allowed

    def cond(state):
        reach, changed, it = state
        return changed & (it < max_iterations)

    def body(state):
        reach, _, it = state
        from platipy_tpu.core.morphology import _neighbor_or

        new = _neighbor_or(reach, connectivity) & allowed
        new = new | reach
        return new, jnp.any(new != reach), it + 1

    reach, _, _ = jax.lax.while_loop(cond, body, (seed_mask, jnp.array(True), 0))
    return _rewrap_int(reach.astype(jnp.uint8), img)


# ---------------------------------------------------------------------------
# shape statistics (LabelShapeStatisticsImageFilter analogue)
# ---------------------------------------------------------------------------

def label_shape_statistics(labels, label: int = 1) -> Dict[str, object]:
    """Shape statistics of one label: physical size, centroid (physical),
    bounding box, principal moments/axes, elongation, flatness, roundness
    (approximate perimeter-based), equivalent radii.

    Mirrors the ``sitk.LabelShapeStatisticsImageFilter`` quantities the
    reference relies on (bronchus.py:162-246, crop.py:44-46).
    Host-side reductions — these are tiny.
    """
    lab, img = _unwrap_int(labels)
    arr = np.asarray(lab) == label
    count = int(arr.sum())
    if img is not None:
        spacing = np.asarray(img.spacing, dtype=np.float64)
    else:
        spacing = np.ones(3)
    out: Dict[str, object] = {"count": count}
    if count == 0:
        return out
    voxel_volume = float(np.prod(spacing))
    out["physical_size"] = count * voxel_volume

    zz, yy, xx = np.nonzero(arr)
    idx_xyz = np.stack([xx, yy, zz], axis=1).astype(np.float64)
    mean_idx = idx_xyz.mean(axis=0)
    if img is not None:
        centroid = img.physical_point(mean_idx)
    else:
        centroid = mean_idx
    out["centroid"] = tuple(float(c) for c in centroid)
    out["centroid_index"] = tuple(float(c) for c in mean_idx)

    # bounding box in ITK order: (x0, y0, z0, sx, sy, sz)
    x0, x1 = int(xx.min()), int(xx.max())
    y0, y1 = int(yy.min()), int(yy.max())
    z0, z1 = int(zz.min()), int(zz.max())
    out["bounding_box"] = (x0, y0, z0, x1 - x0 + 1, y1 - y0 + 1, z1 - z0 + 1)

    # second central moments in physical coords (identity direction assumed
    # for the inertia frame — matches ITK when direction is axis-aligned)
    phys = idx_xyz * spacing[None, :]
    phys -= phys.mean(axis=0, keepdims=True)
    cov = phys.T @ phys / count
    evals, evecs = np.linalg.eigh(cov)  # ascending
    evals = np.maximum(evals, 0.0)
    out["principal_moments"] = tuple(float(v) for v in evals)
    out["principal_axes"] = evecs.T  # rows are axes, ascending moment order
    # ITK: elongation = sqrt(l2/l1) with l sorted ascending -> largest/second
    if evals[1] > 0:
        out["elongation"] = float(np.sqrt(evals[2] / evals[1]))
    else:
        out["elongation"] = 1.0
    if evals[0] > 0:
        out["flatness"] = float(np.sqrt(evals[1] / evals[0]))
    else:
        out["flatness"] = 1.0

    # equivalent spherical radius and (approximate) roundness.
    r_eq = (3.0 * out["physical_size"] / (4.0 * np.pi)) ** (1.0 / 3.0)
    out["equivalent_spherical_radius"] = float(r_eq)
    sphere_area = 4.0 * np.pi * r_eq**2
    # surface area estimate: exposed voxel faces weighted by face area
    area = _exposed_face_area(arr, spacing)
    out["perimeter"] = float(area)
    out["roundness"] = float(sphere_area / area) if area > 0 else 1.0
    return out


def _exposed_face_area(arr: np.ndarray, spacing: np.ndarray) -> float:
    """Voxel-face surface area with the classic 2/3 Crofton-style correction
    (voxelised surfaces over-count smooth area by ~1.5)."""
    pad = np.pad(arr, 1)
    face_areas = np.array(
        [
            spacing[0] * spacing[1],  # z-faces
            spacing[0] * spacing[2],  # y-faces
            spacing[1] * spacing[2],  # x-faces
        ]
    )
    total = 0.0
    core = pad[1:-1, 1:-1, 1:-1]
    for axis, fa in zip((0, 1, 2), face_areas):
        for shift in (-1, 1):
            nb = np.roll(pad, shift, axis=axis)[1:-1, 1:-1, 1:-1]
            total += fa * float((core & ~nb).sum())
    return total * (2.0 / 3.0)


def get_union_mask(mask_list):
    out = None
    for m in mask_list:
        arr = m.array if isinstance(m, Image) else jnp.asarray(m)
        out = arr > 0 if out is None else (out | (arr > 0))
    first = mask_list[0]
    if isinstance(first, Image):
        return first.with_array(out.astype(jnp.uint8))
    return out.astype(jnp.uint8)


# ---------------------------------------------------------------------------

def _unwrap(m):
    if isinstance(m, Image):
        return m.array > 0, m
    return jnp.asarray(m) > 0, None


def _unwrap_int(m):
    if isinstance(m, Image):
        return m.array.astype(jnp.int32), m
    return jnp.asarray(m).astype(jnp.int32), None


def _rewrap_int(arr, img: Optional[Image]):
    if img is not None:
        return img.with_array(arr)
    return arr


def label_intensity_statistics(labels, image, label: int = 1) -> Dict[str, object]:
    """Intensity statistics of ``image`` inside one label: mean, median, std
    (sample, ddof=1 — ITK convention), min, max, sum, variance, count,
    physical size.

    Mirrors the ``sitk.LabelIntensityStatisticsImageFilter`` quantities used
    by the reference (bronchus.py:162, comparison.py:99,299).  Host-side.
    """
    lab, limg = _unwrap_int(labels)
    arr = np.asarray(lab) == label
    vals = np.asarray(image.array if isinstance(image, Image) else image)[arr]
    count = int(arr.sum())
    spacing = np.asarray(limg.spacing, np.float64) if limg is not None else np.ones(3)
    out: Dict[str, object] = {"count": count, "physical_size": count * float(np.prod(spacing))}
    if count == 0:
        return out
    vals = vals.astype(np.float64)
    out.update(
        mean=float(vals.mean()),
        median=float(np.median(vals)),
        sigma=float(vals.std(ddof=1)) if count > 1 else 0.0,
        variance=float(vals.var(ddof=1)) if count > 1 else 0.0,
        minimum=float(vals.min()),
        maximum=float(vals.max()),
        sum=float(vals.sum()),
    )
    return out
