"""Batched stage programs vs their per-structure forms.

The multiatlas/cardiac pipelines replace per-structure loops (reference
multiatlas run.py:352-437) with single batched programs + one stacked device
transfer per stage; these tests pin each batched op to the per-item op it
replaces.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from platipy_tpu.core.components import (
    keep_largest_component,
    keep_largest_component_stack,
)
from platipy_tpu.core.image import from_array
from platipy_tpu.core.interp import INTERP_NEAREST
from platipy_tpu.core.morphology import binary_closing, binary_closing_batched
from platipy_tpu.label.fusion import (
    process_probability_image,
    process_probability_stack,
)
from platipy_tpu.utils.crop import label_to_roi, paste, paste_stack


def _blobs(seed=0, shape=(12, 16, 16), n=3):
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float32)
    stack = []
    for _ in range(n):
        cz, cy, cx = (rng.rand(3) * np.array(shape) * 0.6
                      + np.array(shape) * 0.2)
        r = 2.0 + 2.5 * rng.rand()
        d = np.sqrt((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
        blob = (d < r).astype(np.uint8)
        # second, smaller component so largest-component has work to do
        cz2, cy2, cx2 = (rng.rand(3) * np.array(shape) * 0.5)
        d2 = np.sqrt((zz - cz2) ** 2 + (yy - cy2) ** 2 + (xx - cx2) ** 2)
        blob |= (d2 < 1.5).astype(np.uint8)
        stack.append(blob)
    return np.stack(stack)


def test_paste_stack_matches_paste():
    stack = _blobs(seed=1).astype(np.float32)
    full_shape = (20, 24, 24)
    index_xyz = (3, 5, 2)  # (x, y, z)
    out = np.asarray(paste_stack(jnp.asarray(stack), full_shape, index_xyz,
                                 dtype=jnp.float32))
    template = from_array(np.zeros(full_shape, np.float32))
    for k in range(stack.shape[0]):
        src = from_array(stack[k])
        ref = paste(template, src, src.size, (0, 0, 0), index_xyz)
        np.testing.assert_array_equal(out[k], np.asarray(ref.array))


def test_process_probability_stack_matches_per_image():
    rng = np.random.RandomState(3)
    probs = []
    base = _blobs(seed=4).astype(np.float32)
    for k in range(base.shape[0]):
        p = base[k] * (0.4 + 0.6 * rng.rand(*base[k].shape).astype(np.float32))
        probs.append(p)
    probs.append(np.zeros_like(probs[0]))  # empty map: threshold-only path
    prob_stack = np.stack(probs)
    thresholds = [0.3, 0.5, 0.7, 0.5]

    out = np.asarray(process_probability_stack(jnp.asarray(prob_stack),
                                               thresholds))
    for k in range(prob_stack.shape[0]):
        ref = process_probability_image(from_array(prob_stack[k]),
                                        thresholds[k])
        np.testing.assert_array_equal(out[k], np.asarray(ref.array))


def test_keep_largest_component_stack_matches_per_mask():
    stack = _blobs(seed=7)
    stack = np.concatenate([stack, np.zeros_like(stack[:1])])  # + empty mask
    out = np.asarray(keep_largest_component_stack(jnp.asarray(stack)))
    for k in range(stack.shape[0]):
        ref = keep_largest_component(from_array(stack[k]))
        np.testing.assert_array_equal(out[k], (np.asarray(ref.array) > 0))


def test_binary_closing_batched_matches_per_mask():
    stack = _blobs(seed=9)
    out = np.asarray(binary_closing_batched(jnp.asarray(stack), (1, 1, 1)))
    for k in range(stack.shape[0]):
        ref = binary_closing(from_array(stack[k]), (1, 1, 1))
        np.testing.assert_array_equal(out[k] > 0, np.asarray(ref.array) > 0)


def test_label_to_roi_device_path_matches_host_path():
    m = _blobs(seed=11, shape=(10, 14, 18), n=1)[0]
    img_dev = from_array(m)  # jax array -> axis-profile device path
    img_host = from_array(m).with_array(np.asarray(m))  # numpy -> host path
    for expansion in [(0, 0, 0), (2, 3, 1)]:
        s_d, i_d = label_to_roi(img_dev, expansion_mm=expansion)
        s_h, i_h = label_to_roi(img_host, expansion_mm=expansion)
        assert tuple(s_d) == tuple(s_h)
        assert tuple(i_d) == tuple(i_h)
    # list-of-labels union form
    m2 = _blobs(seed=12, shape=(10, 14, 18), n=1)[0]
    s_u, i_u = label_to_roi([from_array(m), from_array(m2)])
    both = ((m > 0) | (m2 > 0)).astype(np.uint8)
    s_ref, i_ref = label_to_roi(from_array(both).with_array(both))
    assert tuple(s_u) == tuple(s_ref)
    assert tuple(i_u) == tuple(i_ref)


def test_label_to_roi_empty_mask():
    empty = np.zeros((6, 8, 8), np.uint8)
    size, index = label_to_roi(from_array(empty))
    assert tuple(index) == (0, 0, 0)
    assert tuple(size) == (8, 8, 6)  # (x, y, z) full extent fallback


def test_packed_mask_warp_bitwise_matches_per_mask():
    """pack -> NN warp -> unpack is BITWISE-identical to warping each mask
    separately (the invariant the cardiac/multiatlas packed structure
    propagation relies on), for both the DVF multipass warp and the
    affine-transform gather warp."""
    from platipy_tpu.parallel.atlas import (
        batched_warp_by_dvf,
        extract_packed_bit,
        pack_binary_masks,
        unpack_binary_masks,
    )

    rng = np.random.RandomState(3)
    n_bits = 6
    masks = [(rng.rand(8, 12, 12) > 0.55).astype(np.float32)
             for _ in range(n_bits)]
    packed = pack_binary_masks([jnp.asarray(m) for m in masks])
    # integer bit patterns survive the pack/unpack round trip exactly
    rt = np.asarray(unpack_binary_masks(packed, n_bits))
    for i, m in enumerate(masks):
        np.testing.assert_array_equal(rt[i], m)
        np.testing.assert_array_equal(
            np.asarray(extract_packed_bit(packed, i)), m)

    dvf = jnp.asarray(rng.randn(2, 8, 12, 12, 3).astype(np.float32) * 2.5)
    stack2 = jnp.stack([packed, packed])
    warped = batched_warp_by_dvf(stack2, dvf, (1.0, 1.5, 2.0),
                                 interp=INTERP_NEAREST, default_value=0.0)
    unpacked = np.asarray(unpack_binary_masks(warped, n_bits))
    for i, m in enumerate(masks):
        per = batched_warp_by_dvf(
            jnp.stack([jnp.asarray(m)] * 2), dvf, (1.0, 1.5, 2.0),
            interp=INTERP_NEAREST, default_value=0.0)
        np.testing.assert_array_equal(unpacked[i], np.asarray(per))

    # the linear-warp path: packed -> affine NN gather warp -> unpack must
    # also equal the per-mask warps (the pipelines' apply_transforms_batched
    # leg of the packed invariant)
    from platipy_tpu.core.transform import Euler3DTransform
    from platipy_tpu.registration.linear import apply_transforms_batched

    ref = from_array(np.zeros((8, 12, 12), np.float32), spacing=(1.0, 1.5, 2.0))
    tfms = [  # same pytree structure (the batched path stacks the leaves)
        Euler3DTransform(angles=np.zeros(3, np.float32),
                         translation=np.array([1.7, -0.8, 2.2], np.float32)),
        Euler3DTransform(angles=np.array([0.1, -0.05, 0.2], np.float32),
                         translation=np.array([-1.0, 0.5, 0.0], np.float32)),
    ]
    packed_imgs = [ref.with_array(packed)] * 2
    warped_lin = apply_transforms_batched(
        tfms, packed_imgs, ref, interpolator=INTERP_NEAREST,
        default_value=0.0, as_stack=True,
    )
    unpacked_lin = np.asarray(unpack_binary_masks(warped_lin, n_bits))
    for i, m in enumerate(masks):
        per = apply_transforms_batched(
            tfms, [ref.with_array(jnp.asarray(m))] * 2, ref,
            interpolator=INTERP_NEAREST, default_value=0.0, as_stack=True,
        )
        np.testing.assert_array_equal(unpacked_lin[i], np.asarray(per))


def test_pack_binary_masks_validates_count():
    from platipy_tpu.parallel.atlas import pack_binary_masks

    with pytest.raises(ValueError):
        pack_binary_masks([])
    with pytest.raises(ValueError):
        pack_binary_masks([jnp.zeros((2, 2, 2))] * 25)


def test_pack_binary_masks_validates_shapes():
    from platipy_tpu.parallel.atlas import pack_binary_masks

    # a broadcast-compatible mismatch ((y,x) among (z,y,x)) must error, not
    # silently pack garbage
    with pytest.raises(ValueError, match="same-shape"):
        pack_binary_masks([jnp.zeros((2, 4, 4)), jnp.zeros((4, 4))])


def test_demons_batch_chunking_matches_full_batch():
    """Chunked demons (batch_chunk) equals the full-batch program per lane
    (single-device perf formulation; docs/ROOFLINE.md r5)."""
    from platipy_tpu.parallel.atlas import batched_multiscale_demons

    rng = np.random.RandomState(0)
    fixed = jnp.asarray(rng.rand(12, 20, 20).astype(np.float32) * 100)
    moving = jnp.asarray(rng.rand(7, 12, 20, 20).astype(np.float32) * 100)
    kw = dict(spacing_xyz=(1.5, 1.5, 2.0), resolution_staging=[4, 2],
              iteration_staging=[3, 3], smoothing_sigmas=[0, 0])
    full = np.asarray(batched_multiscale_demons(fixed, moving,
                                                batch_chunk=0, **kw))
    chunked = np.asarray(batched_multiscale_demons(fixed, moving,
                                                   batch_chunk=3, **kw))
    # XLA's per-shape fusion choices shift results by ~1 ulp
    np.testing.assert_allclose(chunked, full, atol=1e-5)
    # per-atlas fixed images chunk along the same axis
    fixed_n = jnp.asarray(rng.rand(7, 12, 20, 20).astype(np.float32) * 100)
    full_n = np.asarray(batched_multiscale_demons(fixed_n, moving,
                                                  batch_chunk=0, **kw))
    chunked_n = np.asarray(batched_multiscale_demons(fixed_n, moving,
                                                     batch_chunk=2, **kw))
    np.testing.assert_allclose(chunked_n, full_n, atol=1e-5)
