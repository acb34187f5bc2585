"""Label fusion — weight maps, weighted voting, STAPLE, probability post-proc.

Drop-in mirror of platipy/imaging/label/fusion.py (reference lines 26-328),
rebuilt on-device: weight maps are fused elementwise kernels, voting is a
cross-atlas reduction (a ``psum`` when sharded over an atlas mesh axis), and
STAPLE is an EM ``fori_loop`` over the stacked rater axis.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import functools

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core import filters as _filters
from platipy_tpu.core.components import keep_largest_component
from platipy_tpu.core.image import Image
from platipy_tpu.core.morphology import binary_fill_holes
from platipy_tpu.core.resample import resample
from platipy_tpu.registration.utils import smooth_and_resample

__all__ = [
    "mutual_information",
    "compute_weight_map",
    "combine_labels",
    "combine_labels_staple",
    "process_probability_image",
    "process_probability_stack",
    "staple",
    "weighted_voting_batched",
]

DEFAULT_VOTE_PARAMS = {
    "sigma": 2.0,
    "epsilon": 1e-5,
    "factor": 1e12,
    "gain": 6,
    "blockSize": 5,
    "normalise": False,
    "patch_window_mm": 25,
    "resampled_voxel_size_mm": 3,
    "correlation_function": lambda x: x + 1,
}


def mutual_information(arr_a, arr_b, bins=64):
    """Histogram-based MI of two flat arrays (reference fusion.py:26-53).

    DELIBERATE deviation from the reference, which normalises with
    ``density=True`` (so the "probabilities" sum to 1/(dx*dy), scaling the
    result by the bin area and adding a log offset) and pairs each marginal
    with the wrong axis in ``np.outer``.  Here the joint histogram is
    normalised by its sum and the marginals follow the axis convention of
    ``np.histogram2d`` (axis 0 = arr_a), giving the textbook
    ``sum p_ab * log(p_ab / (p_a p_b))`` in nats.
    """
    arr_a = np.asarray(arr_a).reshape(-1)
    arr_b = np.asarray(arr_b).reshape(-1)
    counts, _, _ = np.histogram2d(arr_a, arr_b, bins=bins)
    total = counts.sum()
    if total == 0:
        return 0.0
    p_ab = counts / total
    p_a = p_ab.sum(axis=1)   # marginal of arr_a (axis 0 indexes arr_a bins)
    p_b = p_ab.sum(axis=0)   # marginal of arr_b
    with np.errstate(divide="ignore", invalid="ignore"):
        log_p = np.log(p_ab / np.outer(p_a, p_b))
    log_p[~np.isfinite(log_p)] = 0
    return float((p_ab * log_p).sum())


def compute_weight_map(
    target_image: Image,
    moving_image: Image,
    vote_type: str = "unweighted",
    vote_params: Optional[dict] = None,
) -> Image:
    """Per-voxel atlas weight map (reference fusion.py:56-202)."""
    params = dict(DEFAULT_VOTE_PARAMS)
    if vote_params:
        params.update(vote_params)

    target_image = target_image.astype(jnp.float32)
    moving_image = moving_image.astype(jnp.float32)
    vote = vote_type.lower()

    if vote == "unweighted":
        weight_map = target_image.with_array(jnp.ones_like(target_image.array))

    elif vote == "global":
        sq_diff = (target_image.array - moving_image.array) ** 2
        global_weight = params["factor"] / jnp.sum(sq_diff, dtype=jnp.float32)
        weight_map = target_image.with_array(
            jnp.full_like(target_image.array, global_weight)
        )

    elif vote == "local":
        sigma = params["sigma"]
        epsilon = params["epsilon"]
        normalise = params["normalise"]
        sq_diff = target_image.with_array(
            (target_image.array - moving_image.array) ** 2
        )
        raw_map = _filters.discrete_gaussian(sq_diff, sigma * sigma)
        weight = (raw_map.array + epsilon) ** -1.0
        weight_map = target_image.with_array(weight)
        weight_map = _normalise_weight(weight_map, normalise)

    elif vote == "block":
        factor = params["factor"]
        gain = params["gain"]
        block_size = params["blockSize"]
        normalise = params["normalise"]
        if isinstance(block_size, int):
            block_size = (block_size,) * 3
        sq_diff = target_image.with_array(
            (target_image.array - moving_image.array) ** 2
        )
        # sitk.BoxMean radius semantics: block_size is the radius per axis
        raw_map = _filters.box_mean(sq_diff, block_size)
        # DELIBERATE deviation from the reference (fusion.py:189-190), which
        # takes raw^-1 unguarded: identical blocks (e.g. the air background of
        # two CTs) give raw == 0 -> inf weights -> NaN fused probabilities.
        # The local vote's epsilon guard is applied here for the same reason.
        weight = factor * ((raw_map.array + params["epsilon"]) ** -1.0) ** abs(gain / 2.0)
        weight_map = target_image.with_array(weight)
        weight_map = _normalise_weight(weight_map, normalise)

    elif vote == "patch_correlation":
        weight_map = _patch_correlation_weight(target_image, moving_image, params)

    else:
        raise ValueError(f"Unknown vote_type {vote_type!r}")

    return weight_map.astype(jnp.float32)


def _normalise_weight(weight_map: Image, normalise) -> Image:
    if isinstance(normalise, bool):
        if normalise:
            return weight_map.with_array(
                weight_map.array / float(np.asarray(weight_map.array).max())
            )
        return weight_map
    if isinstance(normalise, Image):
        masked = jnp.where(normalise.array > 0, weight_map.array, 0.0)
        return weight_map.with_array(
            weight_map.array / float(np.asarray(masked).max())
        )
    return weight_map


def _patch_correlation_weight(target_image: Image, moving_image: Image, params) -> Image:
    """Patch-wise Pearson correlation on a coarse grid (fusion.py:82-146).

    The reference's per-patch Python loop becomes masked local-moment box
    filters: r = (E[xy]-E[x]E[y]) / (std_x std_y) over each window, computed
    with O(1) separable sums — identical values, no host loop.
    """
    voxel_size = params["resampled_voxel_size_mm"]
    img_t = smooth_and_resample(target_image, isotropic_voxel_size_mm=voxel_size)
    img_m = smooth_and_resample(moving_image, isotropic_voxel_size_mm=voxel_size)

    window_mm = params["patch_window_mm"]
    # reference computes window in (z,y,x) from spacing[::-1]
    win_zyx = [max(1, int(window_mm / s)) for s in img_t.spacing_zyx]

    t = img_t.array.astype(jnp.float32)
    m = img_m.array.astype(jnp.float32)
    ones = jnp.ones_like(t)

    def box_sum_zero(arr):
        out = arr
        for axis, w in enumerate(win_zyx):
            k = np.ones(w, dtype=np.float64)
            # zero padding (reference pads arrays with 0 and masks)
            r_lo, r_hi = (w - 1) // 2, w // 2
            pad = [(0, 0)] * out.ndim
            pad[axis] = (r_lo, r_hi)
            padded = jnp.pad(out, pad)
            # valid conv with flat kernel == windowed sum
            idx = [slice(None)] * out.ndim
            acc = None
            n = out.shape[axis]
            for d in range(w):
                sl = jax.lax.dynamic_slice_in_dim(padded, d, n, axis)
                acc = sl if acc is None else acc + sl
            out = acc
        return out

    n_valid = box_sum_zero(ones)
    sum_t = box_sum_zero(t)
    sum_m = box_sum_zero(m)
    sum_tt = box_sum_zero(t * t)
    sum_mm = box_sum_zero(m * m)
    sum_tm = box_sum_zero(t * m)

    mean_t = sum_t / n_valid
    mean_m = sum_m / n_valid
    cov = sum_tm / n_valid - mean_t * mean_m
    var_t = sum_tt / n_valid - mean_t**2
    var_m = sum_mm / n_valid - mean_m**2
    denom = jnp.sqrt(jnp.maximum(var_t, 0.0) * jnp.maximum(var_m, 0.0))
    corr = jnp.where(denom > 1e-12, cov / jnp.maximum(denom, 1e-12), 0.0)
    corr = jnp.nan_to_num(corr)

    corr_img = img_t.with_array(corr)
    corr_img = resample(corr_img, target_image, None, interp=2, default_value=0.0)
    correlation_function = params["correlation_function"]
    return correlation_function(corr_img)


def combine_labels(
    atlas_set: Dict,
    structure_name: Union[str, Sequence[str]],
    label: str = "DIR",
    threshold: float = 1e-4,
    smooth_sigma: float = 1.0,
) -> Dict[str, Image]:
    """Weighted voting fusion over an atlas dict (reference fusion.py:239-292)."""
    case_id_list = list(atlas_set.keys())
    if isinstance(structure_name, str):
        structure_name_list = [structure_name]
    else:
        structure_name_list = list(structure_name)

    combined_label_dict = {}
    for s_name in structure_name_list:
        valid = [i for i in case_id_list if s_name in atlas_set[i][label]]
        weights = jnp.stack(
            [atlas_set[i][label]["Weight Map"].array for i in valid]
        )
        labels = jnp.stack(
            [atlas_set[i][label][s_name].array.astype(jnp.float32) for i in valid]
        )
        ref = atlas_set[valid[0]][label]["Weight Map"]
        combined = weighted_voting_batched(weights, labels)
        img = ref.with_array(combined)
        img = _filters.discrete_gaussian(img, smooth_sigma * smooth_sigma)
        arr = img.array
        # rescale to [0, 1]
        lo, hi = jnp.min(arr), jnp.max(arr)
        arr = (arr - lo) / jnp.maximum(hi - lo, 1e-12)
        if threshold:
            arr = jnp.where(arr >= threshold, arr, 0.0)
        combined_label_dict[s_name] = ref.with_array(arr.astype(jnp.float32))

    return combined_label_dict


def weighted_voting_batched(weights: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Core fusion reduction: sum_i w_i l_i / sum_i w_i over the atlas axis.

    ``weights``/``labels`` are [N, z, y, x].  Under ``shard_map`` over an
    'atlas' mesh axis these sums become ``psum`` collectives on ICI.
    """
    weight_sum = jnp.sum(weights, axis=0)
    weight_sum = jnp.where(weight_sum == 0, 1.0, weight_sum)
    return jnp.sum(weights * labels, axis=0) / weight_sum


def staple(
    label_stack: jnp.ndarray,
    max_iterations: int = 50,
    foreground_prior: Optional[float] = None,
    initial_performance: float = 0.99,
) -> jnp.ndarray:
    """Binary STAPLE EM (Warfield et al.) on a stacked [N, z, y, x] rater axis.

    Returns the per-voxel consensus probability W(x).  The E-step is a fused
    elementwise product over raters; the M-step is a pair of reductions —
    entirely on device (mirrors ``sitk.STAPLE`` used at fusion.py:223).
    """
    d = (label_stack > 0.5).astype(jnp.float32)  # [N, ...]
    n = d.shape[0]
    if foreground_prior is None:
        g = jnp.mean(d)
    else:
        g = jnp.asarray(foreground_prior, jnp.float32)

    p0 = jnp.full((n,), initial_performance, jnp.float32)  # sensitivity
    q0 = jnp.full((n,), initial_performance, jnp.float32)  # specificity

    def em_step(_, carry):
        p, q = carry
        shape = (n,) + (1,) * (d.ndim - 1)
        pr = p.reshape(shape)
        qr = q.reshape(shape)
        # E-step
        a = g * jnp.prod(jnp.where(d > 0.5, pr, 1 - pr), axis=0)
        b = (1 - g) * jnp.prod(jnp.where(d > 0.5, 1 - qr, qr), axis=0)
        w = a / jnp.maximum(a + b, 1e-12)
        # M-step
        wsum = jnp.maximum(jnp.sum(w), 1e-12)
        nwsum = jnp.maximum(jnp.sum(1 - w), 1e-12)
        p_new = jnp.sum(w * d, axis=tuple(range(1, d.ndim))) / wsum
        q_new = jnp.sum((1 - w) * (1 - d), axis=tuple(range(1, d.ndim))) / nwsum
        return p_new, q_new

    p, q = jax.lax.fori_loop(0, max_iterations, em_step, (p0, q0))
    shape = (n,) + (1,) * (d.ndim - 1)
    a = g * jnp.prod(jnp.where(d > 0.5, p.reshape(shape), 1 - p.reshape(shape)), axis=0)
    b = (1 - g) * jnp.prod(
        jnp.where(d > 0.5, 1 - q.reshape(shape), q.reshape(shape)), axis=0
    )
    return a / jnp.maximum(a + b, 1e-12)


def combine_labels_staple(label_list_dict: Dict, threshold: float = 1e-4) -> Dict[str, Image]:
    """STAPLE fusion over an atlas dict (reference fusion.py:205-236)."""
    structure_name_list = [list(i.keys()) for i in label_list_dict.values()]
    structure_name_list = np.unique(
        [item for sublist in structure_name_list for item in sublist]
    )

    combined_label_dict = {}
    for s_name in structure_name_list:
        # not every atlas need carry every structure (combine_labels guards
        # the same way) — fuse over the atlases that do
        carriers = [i for i in label_list_dict if s_name in label_list_dict[i]]
        if not carriers:
            continue
        stack = jnp.stack(
            [
                (label_list_dict[i][s_name].array >= 0.5).astype(jnp.float32)
                for i in carriers
            ]
        )
        ref = label_list_dict[carriers[0]][s_name]
        w = staple(stack)
        # rescale to [0, 1] (sitk.RescaleIntensity)
        lo, hi = jnp.min(w), jnp.max(w)
        w = (w - lo) / jnp.maximum(hi - lo, 1e-12)
        if threshold:
            w = jnp.where(w >= threshold, w, 0.0)
        combined_label_dict[s_name] = ref.with_array(w.astype(jnp.float32))

    return combined_label_dict


def fill_and_largest_component_np(binary_np: "np.ndarray") -> "np.ndarray":
    """Native fill-holes + keep-largest-component on a host binary array —
    the post-threshold tail of :func:`process_probability_image`, shared with
    IAR's bulk path (requires ``native.available()``)."""
    from platipy_tpu import native

    if not binary_np.any():
        return np.zeros_like(binary_np)
    filled = native.fill_holes_3d(binary_np, 6)
    lab = native.cc_label_3d((filled > 0).astype(np.uint8), 26)
    flat = lab.reshape(-1)
    counts = np.bincount(flat[flat > 0]) if flat.any() else np.zeros(1, int)
    if counts.size and counts.max() > 0:
        return (lab == int(counts.argmax())).astype(np.uint8)
    return np.zeros_like(binary_np)


@jax.jit
def _threshold_stack_jit(prob_stack, thresholds):
    """Per-structure max-relative threshold over [S,z,y,x] in one program."""
    max_vals = jnp.max(prob_stack.astype(jnp.float32), axis=(1, 2, 3))
    t = jnp.where(max_vals > 0, thresholds * max_vals, thresholds)
    return (prob_stack >= t[:, None, None, None]).astype(jnp.uint8)


@jax.jit
def _threshold_pack_jit(prob_stack, thresholds):
    """Threshold + bit-pack in one program (8x smaller device->host pull)."""
    return jnp.packbits(_threshold_stack_jit(prob_stack, thresholds).reshape(-1))


def process_probability_stack(prob_stack, thresholds) -> jnp.ndarray:
    """Batched :func:`process_probability_image`: threshold + fill holes +
    keep largest component for a whole [S,z,y,x] stack of probability maps.

    Runs entirely ON DEVICE as one program (threshold + segmented-scan
    fill/largest, ``core.components.fill_and_largest_component_stack_device``)
    — no host round trip at all; the earlier host-native formulation pulled
    a bit-packed stack, paid ~0.25 s of single-core host time per structure,
    and pushed the result back.  Returns a [S,z,y,x] uint8 device array.
    """
    from platipy_tpu.core.components import (
        fill_and_largest_component_stack_device,
    )

    thresholds = jnp.asarray(thresholds, jnp.float32)
    binary = _threshold_stack_jit(prob_stack, thresholds)
    return fill_and_largest_component_stack_device(binary)


def process_probability_image(probability_image: Image, threshold: float = 0.5) -> Image:
    """Probability map -> binary mask post-processing (fusion.py:295-328).

    Device work reduces to scalars; the binary mask crosses to the host ONCE
    (uint8) for the native fill-hole + largest-component pass and the result
    is pushed back once — full-volume f32 fetches over a remote-device link
    dominate otherwise.
    """
    arr = probability_image.array.astype(jnp.float32)
    max_val = float(jnp.max(arr))  # scalar fetch, not a full-volume pull
    thresh = threshold * max_val if max_val > 0 else threshold
    binary = arr >= thresh
    n_on = int(jnp.sum(binary))  # scalar fetch
    if n_on == 0:
        return probability_image.with_array(binary.astype(jnp.uint8))
    binary_np = np.asarray(binary.astype(jnp.uint8))  # the one volume pull

    from platipy_tpu import native

    if native.available():
        return probability_image.with_array(
            jnp.asarray(fill_and_largest_component_np(binary_np))
        )

    filled = binary_fill_holes(jnp.asarray(binary_np) > 0)
    largest = keep_largest_component(filled > 0)
    return probability_image.with_array(
        (jnp.asarray(largest) > 0).astype(jnp.uint8)
    )
