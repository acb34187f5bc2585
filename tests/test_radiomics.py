"""Native radiomics feature classes (first order, shape, GLCM, GLRLM) —
analytic sanity on known geometries (the reference service delegates to
pyradiomics, services/radiomics/service.py:25-45)."""

import numpy as np
import pytest

from platipy_tpu.core.image import from_array
from platipy_tpu.radiomics import (
    extract_features,
    extract_first_order,
    extract_glcm,
    extract_glrlm,
    extract_shape,
)


@pytest.fixture
def ball():
    zz, yy, xx = np.mgrid[:40, :40, :40].astype(np.float64)
    m = (zz - 20) ** 2 + (yy - 20) ** 2 + (xx - 20) ** 2 <= 15**2
    return from_array(m.astype(np.uint8), spacing=(1.0, 1.0, 1.0))


def test_shape_ball(ball):
    s = extract_shape(ball)
    assert abs(s["MeshVolume"] - 4 / 3 * np.pi * 15**3) / (4 / 3 * np.pi * 15**3) < 0.01
    assert abs(s["Maximum3DDiameter"] - 30.0) < 1.5
    assert 0.95 < s["Elongation"] <= 1.0 and 0.95 < s["Flatness"] <= 1.0
    # voxel-face surface overestimates a sphere's area by ~1.5x (known
    # deviation from pyradiomics' mesh surface) -> sphericity ~0.66
    assert 0.6 < s["Sphericity"] < 0.75


def test_shape_anisotropic_spacing():
    m = np.zeros((10, 10, 10), np.uint8)
    m[2:8, 2:8, 2:8] = 1
    s = extract_shape(from_array(m, spacing=(2.0, 1.0, 1.0)))  # (x,y,z)
    assert s["MeshVolume"] == 6 * 6 * 6 * 2.0
    # box surface: 2*(a*b + a*c + b*c) with a=12mm(x) b=6mm(y) c=6mm(z)
    assert s["SurfaceArea"] == 2 * (12 * 6 + 12 * 6 + 6 * 6)


def test_first_order_oracle():
    rng = np.random.RandomState(0)
    img = from_array(rng.rand(12, 12, 12).astype(np.float32) * 50)
    mask = from_array(np.ones((12, 12, 12), np.uint8))
    f = extract_first_order(img, mask)
    vals = np.asarray(img.array, np.float64).ravel()
    assert abs(f["Mean"] - vals.mean()) < 1e-9
    assert abs(f["StandardDeviation"] - vals.std()) < 1e-9
    assert abs(f["Energy"] - (vals**2).sum()) < 1e-6
    assert abs(f["RootMeanSquared"] - np.sqrt((vals**2).mean())) < 1e-9


def test_glcm_constant_image():
    const = from_array(np.full((16, 16, 16), 5.0, np.float32))
    mask = from_array(np.ones((16, 16, 16), np.uint8))
    g = extract_glcm(const, mask, bins=8)
    assert g["JointEnergy"] == 1.0
    assert g["JointEntropy"] == 0.0
    assert g["Contrast"] == 0.0
    assert g["MaximumProbability"] == 1.0


def test_glcm_checkerboard_contrast():
    zz, yy, xx = np.mgrid[:12, :12, :12]
    img = from_array(((zz + yy + xx) % 2).astype(np.float32) * 10)
    mask = from_array(np.ones((12, 12, 12), np.uint8))
    g = extract_glcm(img, mask, bins=2)
    # along axis directions every neighbour pair differs by the full range
    assert g["Contrast"] > 0.4
    assert g["JointEntropy"] > 0.5


def test_glrlm_constant_vs_noise():
    mask = from_array(np.ones((12, 12, 12), np.uint8))
    const = from_array(np.full((12, 12, 12), 3.0, np.float32))
    noise = from_array(np.random.RandomState(1).rand(12, 12, 12).astype(np.float32))
    r_const = extract_glrlm(const, mask, bins=8)
    r_noise = extract_glrlm(noise, mask, bins=8)
    assert r_const["LongRunEmphasis"] > r_noise["LongRunEmphasis"] * 5
    assert r_const["RunPercentage"] < r_noise["RunPercentage"]


def test_extract_features_keys(ball):
    img = from_array(np.random.RandomState(0).rand(40, 40, 40).astype(np.float32))
    f = extract_features(img, ball)
    assert any(k.startswith("original_firstorder_") for k in f)
    assert any(k.startswith("original_shape_") for k in f)
    assert any(k.startswith("original_glcm_") for k in f)
    assert any(k.startswith("original_glrlm_") for k in f)
    assert len(f) >= 55


def test_glszm_zones():
    # two separate uniform zones of one level -> SZN counts them
    from platipy_tpu.radiomics import extract_glszm

    arr = np.zeros((8, 8, 8), np.float32)
    arr[1:3, 1:3, 1:3] = 10.0   # zone of 8
    arr[5:7, 5:7, 5:7] = 10.0   # zone of 8 (disconnected)
    mask = from_array(np.ones((8, 8, 8), np.uint8))
    g = extract_glszm(from_array(arr), mask, bins=2)
    # background zone (1 big zone) + two foreground zones of size 8
    assert g["ZonePercentage"] == pytest.approx(3 / 512)
    assert g["LargeAreaEmphasis"] > 1000  # dominated by the background zone


def test_ngtdm_constant_vs_checkerboard():
    from platipy_tpu.radiomics import extract_ngtdm

    mask = from_array(np.ones((10, 10, 10), np.uint8))
    const = from_array(np.full((10, 10, 10), 3.0, np.float32))
    zz, yy, xx = np.mgrid[:10, :10, :10]
    checker = from_array(((zz + yy + xx) % 2).astype(np.float32))
    n_const = extract_ngtdm(const, mask, bins=4)
    n_check = extract_ngtdm(checker, mask, bins=4)
    assert n_const["Coarseness"] > n_check["Coarseness"] * 100
    assert n_check["Contrast"] > n_const["Contrast"]


def test_gldm_dependence():
    from platipy_tpu.radiomics import extract_gldm

    mask = from_array(np.ones((10, 10, 10), np.uint8))
    const = from_array(np.full((10, 10, 10), 3.0, np.float32))
    noise = from_array(np.random.RandomState(2).rand(10, 10, 10).astype(np.float32))
    d_const = extract_gldm(const, mask, bins=8)
    d_noise = extract_gldm(noise, mask, bins=8)
    assert d_const["LargeDependenceEmphasis"] > d_noise["LargeDependenceEmphasis"] * 10
    assert d_noise["DependenceEntropy"] > d_const["DependenceEntropy"]


def test_extract_features_all_seven_classes(ball):
    img = from_array(np.random.RandomState(0).rand(40, 40, 40).astype(np.float32))
    f = extract_features(img, ball)
    prefixes = {k.split("_")[1] for k in f}
    assert prefixes >= {"firstorder", "shape", "glcm", "glrlm", "glszm",
                        "ngtdm", "gldm"}
    assert len(f) >= 85


def test_extract_custom_percentiles(ball):
    """The reference's RadiomicsCustom features: 25th/75th ROI percentiles
    (reference services/radiomics/radiomics_custom.py:26-32)."""
    rng = np.random.RandomState(3)
    arr = rng.rand(40, 40, 40).astype(np.float32)
    img = from_array(arr)
    f = extract_features(img, ball, classes=("custom",))
    vals = arr[np.asarray(ball.array) > 0]
    assert f["original_custom_25Percentile"] == pytest.approx(
        np.percentile(vals, 25))
    assert f["original_custom_75Percentile"] == pytest.approx(
        np.percentile(vals, 75))
