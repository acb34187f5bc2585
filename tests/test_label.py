"""Label comparison + fusion tests.

The surface-metric assertions use the reference's exact golden values
(platipy/imaging/tests/test_metrics.py:6-70) — the precision parity bar.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from platipy_tpu.core.image import Image, from_array
from platipy_tpu.label.comparison import (
    compute_metric_dsc,
    compute_metric_hd,
    compute_metric_masd,
    compute_metric_sensitivity,
    compute_metric_specificity,
    compute_metric_total_apl,
    compute_surface_dsc,
    compute_surface_metrics,
    compute_volume,
    compute_volume_metrics,
)
from platipy_tpu.label.fusion import (
    combine_labels,
    combine_labels_staple,
    compute_weight_map,
    process_probability_image,
    staple,
    weighted_voting_batched,
)
from platipy_tpu.label.utils import (
    binary_decode_image,
    binary_encode_structure_list,
    correct_volume_overlap,
    get_com,
    prime_decode_image,
    prime_encode_structure_list,
)


def _box_label(lo, hi, shape=(100, 100, 100), spacing=(1, 1, 2)):
    """sitk-style box: label[lo:hi, lo:hi, lo:hi] in (x,y,z) index order."""
    arr = np.zeros(shape, dtype=np.uint8)
    arr[lo:hi, lo:hi, lo:hi] = 1  # cube: identical in either order
    return from_array(arr, spacing=spacing)


def test_surface_dsc_reference_goldens():
    label_a = _box_label(30, 70)

    label_b = _box_label(30, 71)
    assert compute_surface_dsc(label_a, label_b) == 1.0

    label_b = _box_label(35, 71)
    assert np.allclose(compute_surface_dsc(label_a, label_b), 0.5158373786407767)

    label_b = _box_label(35, 72)
    assert np.allclose(compute_surface_dsc(label_a, label_b), 0.39725541227966404)

    label_b = _box_label(35, 75)
    assert np.allclose(compute_surface_dsc(label_a, label_b), 0.1258764241893076)


def test_surface_metrics_reference_goldens():
    label_a = _box_label(30, 70)
    label_b = _box_label(30, 71)
    metrics = compute_surface_metrics(label_a, label_b)
    assert np.allclose(metrics["hausdorffDistance"], 2.449489742783178, atol=1e-5)
    assert np.allclose(metrics["meanSurfaceDistance"], 0.6649174304423457, atol=1e-5)
    # NOTE: the reference golden is 0.5740991 because ITK's
    # LabelIntensityStatisticsImageFilter computes medians from a coarse
    # histogram; we report the exact median (documented deviation)
    assert np.allclose(metrics["medianSurfaceDistance"], 0.5, atol=1e-5)
    assert np.allclose(metrics["maximumSurfaceDistance"], 2.4494898319244385, atol=1e-5)
    assert np.allclose(metrics["sigmaSurfaceDistance"], 101.78549149738755, rtol=1e-5)
    assert np.allclose(metrics["surfaceDSC"], 1.0)

    label_b = _box_label(35, 71)
    metrics = compute_surface_metrics(label_a, label_b)
    assert np.allclose(metrics["hausdorffDistance"], 12.24744871391589, atol=1e-4)
    assert np.allclose(metrics["meanSurfaceDistance"], 3.842314521867095, atol=1e-4)
    # exact median (ITK golden 3.5163573920726776 is histogram-approximated)
    assert abs(metrics["medianSurfaceDistance"] - 3.5163573920726776) < 0.25
    assert np.allclose(metrics["maximumSurfaceDistance"], 12.24744871391589, atol=1e-4)
    assert np.allclose(metrics["sigmaSurfaceDistance"], 392.57229390698296, rtol=1e-4)
    assert np.allclose(metrics["surfaceDSC"], 0.5158373786407767)


def test_volume_and_dsc_metrics():
    a = _box_label(10, 30, shape=(50, 50, 50), spacing=(1, 1, 1))
    b = _box_label(15, 35, shape=(50, 50, 50), spacing=(1, 1, 1))
    assert compute_volume(a) == pytest.approx(20**3 / 1000)
    dsc = compute_metric_dsc(a, b)
    expected = 2 * 15**3 / (2 * 20**3)
    assert dsc == pytest.approx(expected)
    vm = compute_volume_metrics(a, b)
    assert vm["DSC"] == pytest.approx(expected)
    assert compute_metric_sensitivity(a, b) == pytest.approx(15**3 / 20**3)
    # auto-crop (reference semantics) restricts TN to the union bounding box:
    # box [10,35)^3 -> TN = 25^3 - (2*20^3 - 15^3) = 3000, FP = 20^3 - 15^3
    assert compute_metric_specificity(a, b) == pytest.approx(3000 / (3000 + 4625))
    # without auto-crop the full volume provides the TN pool
    assert compute_metric_specificity(a, b, auto_crop=False) > 0.9


def test_hd_masd_analytic():
    a = _box_label(10, 30, shape=(50, 50, 50), spacing=(1, 1, 1))
    b = _box_label(10, 31, shape=(50, 50, 50), spacing=(1, 1, 1))
    hd = compute_metric_hd(a, b)
    assert hd == pytest.approx(np.sqrt(3), abs=1e-5)
    masd = compute_metric_masd(a, b)
    assert 0 < masd < 1.0


def test_apl():
    a = _box_label(10, 30, shape=(50, 50, 50), spacing=(1, 1, 1))
    assert compute_metric_total_apl(a, a, distance_threshold_mm=0) == 0.0
    b = _box_label(12, 32, shape=(50, 50, 50), spacing=(1, 1, 1))
    apl_strict = compute_metric_total_apl(a, b, distance_threshold_mm=0)
    apl_tol = compute_metric_total_apl(a, b, distance_threshold_mm=3)
    assert apl_strict > 0
    assert apl_tol < apl_strict


def test_weight_maps():
    rng = np.random.RandomState(0)
    target = from_array(rng.rand(20, 20, 20).astype(np.float32) * 100)
    moving = from_array(
        np.asarray(target.array) + rng.rand(20, 20, 20).astype(np.float32) * 10
    )
    w_u = compute_weight_map(target, moving, "unweighted")
    np.testing.assert_allclose(np.asarray(w_u.array), 1.0)
    w_g = compute_weight_map(target, moving, "global")
    assert np.unique(np.asarray(w_g.array)).size == 1
    w_l = compute_weight_map(target, moving, "local")
    assert np.asarray(w_l.array).min() > 0
    w_b = compute_weight_map(target, moving, "block")
    assert np.isfinite(np.asarray(w_b.array)).all()
    # identical images: sq-diff is exactly 0, weights must stay finite (the
    # reference's unguarded raw^-1 returns inf here and fusion goes NaN)
    w_b0 = compute_weight_map(target, target, "block")
    assert np.isfinite(np.asarray(w_b0.array)).all()
    w_l0 = compute_weight_map(target, target, "local")
    assert np.isfinite(np.asarray(w_l0.array)).all()
    w_p = compute_weight_map(target, moving, "patch_correlation")
    # identical-ish images: correlation+1 should be ~2 in the interior
    assert np.asarray(w_p.array).max() > 1.5


def test_weighted_voting_and_combine_labels():
    ref = from_array(np.zeros((16, 16, 16), np.float32))
    atlas_set = {}
    rng = np.random.RandomState(1)
    for i in range(4):
        mask = np.zeros((16, 16, 16), np.float32)
        mask[4:12, 4:12, 4 + (i % 2) : 12 + (i % 2)] = 1.0
        atlas_set[f"case{i}"] = {
            "DIR": {
                "Weight Map": ref.with_array(jnp.ones((16, 16, 16), jnp.float32)),
                "STRUCT": ref.with_array(jnp.asarray(mask)),
            }
        }
    combined = combine_labels(atlas_set, "STRUCT", smooth_sigma=0.0)
    arr = np.asarray(combined["STRUCT"].array)
    assert arr.max() == pytest.approx(1.0)
    assert arr[8, 8, 8] == pytest.approx(1.0)   # all agree
    # voxels where half agree get intermediate probability
    assert 0.0 < arr[8, 8, 4] < 1.0


def test_staple_consensus():
    rng = np.random.RandomState(2)
    truth = np.zeros((20, 20, 20), bool)
    truth[5:15, 5:15, 5:15] = True
    raters = []
    for i in range(5):
        noisy = truth ^ (rng.rand(20, 20, 20) < 0.02)
        raters.append(noisy)
    stack = jnp.asarray(np.stack(raters).astype(np.float32))
    w = np.asarray(staple(stack, max_iterations=30))
    est = w > 0.5
    dsc = 2 * (est & truth).sum() / (est.sum() + truth.sum())
    assert dsc > 0.98


def test_combine_labels_staple_dict_api():
    ref = from_array(np.zeros((16, 16, 16), np.float32))
    label_list_dict = {}
    for i in range(3):
        mask = np.zeros((16, 16, 16), np.float32)
        mask[4:12, 4:12, 4:12] = 1.0
        label_list_dict[f"case{i}"] = {"S": ref.with_array(jnp.asarray(mask))}
    out = combine_labels_staple(label_list_dict)
    arr = np.asarray(out["S"].array)
    assert arr[8, 8, 8] > 0.99
    assert arr[0, 0, 0] == 0.0


def test_process_probability_image():
    prob = np.zeros((20, 20, 20), np.float32)
    prob[5:12, 5:12, 5:12] = 0.9     # main blob
    prob[6:9, 6:9, 6:9] = 0.0        # hole to fill
    prob[15:17, 15:17, 15:17] = 0.8  # small distractor blob
    img = from_array(prob)
    out = np.asarray(process_probability_image(img, 0.5).array)
    assert out[7, 7, 7] == 1      # hole filled
    assert out[16, 16, 16] == 0   # distractor removed
    assert out[8, 10, 10] == 1


def test_encodings_roundtrip():
    ref = from_array(np.zeros((10, 10, 10), np.uint8))
    s1 = ref.with_array(jnp.asarray(np.pad(np.ones((4, 4, 4), np.uint8), ((0, 6),) * 3)))
    s2 = ref.with_array(jnp.asarray(np.pad(np.ones((5, 5, 5), np.uint8), ((5, 0),) * 3)))
    enc_b = binary_encode_structure_list([s1, s2])
    dec_b = binary_decode_image(enc_b)
    assert len(dec_b) == 2
    np.testing.assert_array_equal(np.asarray(dec_b[0].array) > 0, np.asarray(s1.array) > 0)
    enc_p = prime_encode_structure_list([s1, s2])
    dec_p = prime_decode_image(enc_p)
    assert len(dec_p) >= 2
    np.testing.assert_array_equal(np.asarray(dec_p[0].array) > 0, np.asarray(s1.array) > 0)


def test_correct_volume_overlap():
    ref = from_array(np.zeros((12, 12, 12), np.uint8))
    big = np.zeros((12, 12, 12), np.uint8)
    big[2:10, 2:10, 2:10] = 1
    small = np.zeros((12, 12, 12), np.uint8)
    small[6:11, 6:11, 6:11] = 1
    d = {"big": ref.with_array(jnp.asarray(big)), "small": ref.with_array(jnp.asarray(small))}
    out = correct_volume_overlap(d)
    a_big = np.asarray(out["big"].array) > 0
    a_small = np.asarray(out["small"].array) > 0
    assert not (a_big & a_small).any()          # no overlap remains
    assert (a_big | a_small).sum() == ((big | small) > 0).sum()
    assert a_big[7, 7, 7] and not a_small[7, 7, 7]  # overlap went to largest


def test_get_com():
    arr = np.zeros((10, 10, 10), np.uint8)
    arr[2:4, 4:6, 6:8] = 1
    img = from_array(arr, origin=(1, 2, 3), spacing=(2, 2, 2))
    com = get_com(img)
    assert com == [2, 4, 6]
    com_real = get_com(img, real_coords=True)
    np.testing.assert_allclose(com_real, [1 + 6.5 * 2, 2 + 4.5 * 2, 3 + 2.5 * 2])