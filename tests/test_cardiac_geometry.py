"""Geometric cardiac utilities: LV-17 segments, conduction nodes, vessel
splining, NRRD export, rotation (reference utils/{ventricle,conduction,
vessel,io,geometry}.py — these had no dedicated tests in the reference; the
assertions here are analytic/geometric oracles on synthetic chambers).

The phantom uses realistic-scale anatomy (LV radius 25 mm): the AHA model's
hard-coded basal ``radius_min=15`` voxels and ``min_area_mm2=50`` sector
filter (reference ventricle.py:587,85) legitimately blank every segment on a
toy-sized ventricle.
"""

import gzip
import os
import tempfile

import numpy as np
import pytest

from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import (
    insert_cylinder_image,
    insert_sphere_image,
)

SPACING = (1.0, 1.0, 1.0)
SHAPE = (80, 96, 96)


def _empty(shape=SHAPE, spacing=SPACING):
    return from_array(np.zeros(shape, np.uint8), spacing=spacing)


@pytest.fixture(scope="module")
def chambers():
    """Synthetic 4-chamber anatomy, apex inferior (low z), atria superior."""
    lv = insert_sphere_image(_empty(), sp_radius=25, sp_centre=(30, 60, 40))
    la = insert_sphere_image(_empty(), sp_radius=15, sp_centre=(58, 60, 40))
    rv = insert_sphere_image(_empty(), sp_radius=20, sp_centre=(38, 28, 55))
    ra = insert_sphere_image(_empty(), sp_radius=15, sp_centre=(58, 28, 55))
    heart_arr = (
        (np.asarray(lv.array) > 0) | (np.asarray(la.array) > 0)
        | (np.asarray(rv.array) > 0) | (np.asarray(ra.array) > 0)
    )
    from platipy_tpu.core.morphology import binary_dilate

    heart = binary_dilate(from_array(heart_arr.astype(np.uint8), spacing=SPACING),
                          (3, 3, 3))
    return {"Ventricle_L": lv, "Atrium_L": la, "Ventricle_R": rv,
            "Atrium_R": ra, "Heart": heart}


def test_left_ventricle_17_segments(chambers):
    """All 17 AHA segments come back on the input grid; the apical cap (17)
    sits inferior to the basal ring (1-6) along the long axis."""
    from platipy_tpu.utils.ventricle import generate_left_ventricle_segments

    segs = generate_left_ventricle_segments(chambers, optimiser_max_iter=2)
    keys = [f"Ventricle_L_Segment{i}" for i in range(1, 18)]
    assert sorted(segs.keys()) == sorted(keys)
    lv = chambers["Ventricle_L"]
    nonempty = 0
    for k in keys:
        assert segs[k].spatial_shape == lv.spatial_shape
        assert segs[k].spacing == lv.spacing
        if int(np.asarray(segs[k].array).sum()) > 0:
            nonempty += 1
    # realistic-scale spherical LV: expect nearly all segments populated
    assert nonempty >= 14

    def mean_z(name):
        arr = np.asarray(segs[name].array)
        return np.nonzero(arr)[0].mean() if arr.any() else np.nan

    apex_z = mean_z("Ventricle_L_Segment17")
    basal_z = np.nanmean([mean_z(f"Ventricle_L_Segment{i}") for i in range(1, 7)])
    # atria are at larger z here, so the base (near the MV) is superior
    assert apex_z < basal_z
    # segments tile the myocardium: only a small boundary fraction overlaps
    # (per-segment hole-fill closing grows adjacent segments into each other
    # slightly, as in the reference's per-segment BinaryMorphologicalClosing)
    stack = np.stack([np.asarray(segs[k].array) > 0 for k in keys])
    counts = stack.sum(axis=0)
    assert float((counts > 1).sum()) / float((counts > 0).sum()) < 0.15


def test_geometric_sinoatrialnode(chambers):
    """SAN lands inside the heart near the SVC-RA junction, with the
    requested sphere size (volume in cc)."""
    from platipy_tpu.label.comparison import compute_volume
    from platipy_tpu.utils.conduction import geometric_sinoatrialnode

    ra = chambers["Atrium_R"]
    # cyl_centre is (x, y, z) index order (reference image.py quirk)
    svc = insert_cylinder_image(_empty(), cyl_radius=(5, 5), cyl_height=20,
                                cyl_centre=(55, 28, 70))
    san = geometric_sinoatrialnode(svc, ra, chambers["Heart"], radius_mm=6)
    arr = np.asarray(san.array)
    assert arr.sum() > 0
    assert san.spatial_shape == chambers["Heart"].spatial_shape
    # volume ~ (4/3)pi (0.6cm)^3 = 0.905 cc (discretisation tolerance)
    vol_cc = float(compute_volume(san))
    assert 0.5 < vol_cc < 1.4
    # near the SVC-RA junction: y in the right-atrial band, z superior
    zz, yy, xx = np.nonzero(arr)
    assert abs(yy.mean() - 28) < 12
    assert zz.mean() > 50


def test_geometric_atrioventricularnode():
    """AVN lands between the four chambers (centre of the AV plane).

    Chambers here form a quadrant clover so the construction slice (10 mm
    above the inferior atrial limit) shows four distinct 2-D blobs, as in
    real anatomy."""
    from platipy_tpu.utils.conduction import geometric_atrioventricularnode

    la = insert_sphere_image(_empty(), sp_radius=15, sp_centre=(52, 62, 30))
    ra = insert_sphere_image(_empty(), sp_radius=15, sp_centre=(52, 30, 30))
    lv = insert_sphere_image(_empty(), sp_radius=20, sp_centre=(35, 62, 60))
    rv = insert_sphere_image(_empty(), sp_radius=20, sp_centre=(35, 30, 60))
    avn = geometric_atrioventricularnode(la, lv, ra, rv, radius_mm=6)
    arr = np.asarray(avn.array)
    assert arr.sum() > 0
    zz, yy, xx = np.nonzero(arr)
    # centred between left (y=62) and right (y=30), atria (x=30) and
    # ventricles (x=60) — i.e. the middle of the clover
    assert 35 <= yy.mean() <= 57
    assert 35 <= xx.mean() <= 55
    # on the slice 10 mm above the inferior atrial limit (z = 37 + 10)
    assert abs(zz.mean() - 47) < 8


def test_polyline_distance2_brute_force_oracle():
    """polyline_distance2 matches brute-force point-to-segment distances
    exactly (within f32) on an anisotropic grid with a non-zero origin."""
    from platipy_tpu.core.distance import polyline_distance2

    rng = np.random.RandomState(3)
    shape = (12, 20, 24)
    spacing = (1.3, 0.9, 2.1)   # (x, y, z)
    origin = (-4.0, 2.5, 7.0)
    pts = np.cumsum(rng.uniform(-3, 3, size=(7, 3)), axis=0) + np.array(
        [origin[0] + 8, origin[1] + 6, origin[2] + 9]
    )
    max_d = 10.0
    d2 = np.asarray(polyline_distance2(pts, shape, origin, spacing, max_d))

    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float64)
    px = origin[0] + xx * spacing[0]
    py = origin[1] + yy * spacing[1]
    pz = origin[2] + zz * spacing[2]
    p = np.stack([px, py, pz], axis=-1).reshape(-1, 3)
    best = np.full(p.shape[0], np.inf)
    for a, b in zip(pts[:-1], pts[1:]):
        ab = b - a
        t = np.clip((p - a) @ ab / max(ab @ ab, 1e-12), 0.0, 1.0)
        proj = a + t[:, None] * ab
        best = np.minimum(best, np.sum((p - proj) ** 2, axis=-1))
    best = best.reshape(shape)

    inside = best <= max_d**2  # beyond the margin the kernel may report _INF
    assert inside.sum() > 200
    np.testing.assert_allclose(d2[inside], best[inside], rtol=1e-4, atol=1e-3)


def test_tube_mask_subvoxel_centreline():
    """The tube rasteriser keeps sub-voxel centrelines: an off-grid straight
    line yields the exact analytic disc on every slice (no voxel snapping)."""
    from platipy_tpu.core.distance import polyline_distance2

    shape = (8, 40, 40)
    spacing = (1.0, 1.0, 2.0)
    # line at x=20.37, y=19.73 (mm), spanning z
    pts = np.array([[20.37, 19.73, -2.0], [20.37, 19.73, 18.0]])
    d2 = np.asarray(polyline_distance2(pts, shape, (0, 0, 0), spacing, 6.0))
    yy, xx = np.mgrid[:40, :40].astype(np.float64)
    analytic = (xx * 1.0 - 20.37) ** 2 + (yy * 1.0 - 19.73) ** 2
    for z in range(8):
        got = d2[z] <= 4.5**2
        want = analytic <= 4.5**2
        assert np.array_equal(got, want)


def test_vessel_spline_generation():
    """Splined vessel from 3 atlases of a bent tube overlaps every atlas
    tube and stays tubular (reference vessel.py:336-435 semantics)."""
    from platipy_tpu.label.comparison import compute_metric_dsc
    from platipy_tpu.utils.vessel import vessel_spline_generation

    def tube(shift):
        arr = np.zeros((48, 64, 64), np.uint8)
        for z in range(6, 42):
            cy = 32 + shift + int(6 * np.sin(z / 12.0))
            cx = 30 + shift
            yy, xx = np.mgrid[:64, :64]
            arr[z][(yy - cy) ** 2 + (xx - cx) ** 2 <= 4.0**2] = 1
        return from_array(arr, spacing=(1.0, 1.0, 2.0))

    atlas_set = {str(i): {"DIR": {"VESSEL": tube(i - 1)}} for i in range(3)}
    ref = atlas_set["0"]["DIR"]["VESSEL"]
    out = vessel_spline_generation(
        ref, atlas_set, ["VESSEL"],
        vessel_radius_mm_dict={"VESSEL": 4},
        stop_condition_type_dict={"VESSEL": "count"},
        stop_condition_value_dict={"VESSEL": 1},
        scan_direction_dict={"VESSEL": "z"},
    )
    assert "VESSEL" in out
    vessel = out["VESSEL"]
    assert vessel.spatial_shape == ref.spatial_shape
    # the consensus spline tube overlaps the middle atlas tube well
    dsc = float(compute_metric_dsc(atlas_set["1"]["DIR"]["VESSEL"], vessel))
    assert dsc > 0.6


def test_spline_smoothing_recovers_noisy_centreline():
    """A smoothing spline (spline_smoothing > 0) fitted through noisy COM
    points lies closer to the true smooth centreline than the interpolating
    spline, and smoothing=0 reproduces the interpolating behaviour."""
    from platipy_tpu.utils.vessel import spline_centreline

    rng = np.random.RandomState(3)
    z = np.arange(0, 60, 1.0)
    truth = np.stack([z, 30 + 5 * np.sin(z / 15.0), 30 + 5 * np.cos(z / 20.0)], 1)
    noisy = truth + np.concatenate(
        [np.zeros((60, 1)), rng.randn(60, 2)], axis=1)

    def rms_to_truth(curve):
        # distance of each sampled curve point to the nearest truth point
        d = np.linalg.norm(curve[:, None, :] - truth[None, :, :], axis=2)
        return float(np.sqrt(np.mean(d.min(axis=1) ** 2)))

    interp = spline_centreline(noisy)
    smooth = spline_centreline(noisy, smoothing=2.0)
    assert rms_to_truth(smooth) < rms_to_truth(interp) * 0.7
    # smoothing=0 is exactly the interpolating path
    np.testing.assert_allclose(spline_centreline(noisy, smoothing=0.0), interp)


def test_com_from_probability_exact_centroid():
    """Per-slice probability-weighted COMs: an analytic asymmetric mass
    distribution has a closed-form centroid; thresholding drops sub-threshold
    voxels and min_mass drops empty slices."""
    from platipy_tpu.utils.vessel import com_from_probability

    arr = np.zeros((4, 16, 16), np.float32)
    # slice 1: two voxels, masses 0.6 @ (y=4,x=6) and 0.3 @ (y=8,x=10)
    arr[1, 4, 6] = 0.6
    arr[1, 8, 10] = 0.3
    # slice 2: one voxel below threshold only -> dropped by min_mass
    arr[2, 5, 5] = 0.2
    img = from_array(arr, spacing=(2.0, 1.0, 3.0), origin=(10.0, 20.0, 30.0))
    pts = com_from_probability(img, scan_direction="z",
                               prob_threshold=0.25, min_mass=0.5)
    assert len(pts) == 1
    cx = (0.6 * 6 + 0.3 * 10) / 0.9
    cy = (0.6 * 4 + 0.3 * 8) / 0.9
    np.testing.assert_allclose(pts[0], [10.0 + 2.0 * cx, 20.0 + 1.0 * cy,
                                        30.0 + 3.0 * 1], atol=1e-5)


def test_fused_probability_downweights_misregistered_atlas():
    """The intensity-weighted fusion suppresses an atlas whose CT disagrees
    with the target: the fused probability's slice COM stays near the two
    agreeing tubes, not the dragged mean of all three."""
    from platipy_tpu.utils.vessel import (
        com_from_probability,
        fused_vessel_probability,
    )

    ny = nx = 48
    yy, xx = np.mgrid[:ny, :nx].astype(np.float32)

    def case(cx, intensity_shift=0.0):
        ct = np.zeros((8, ny, nx), np.float32)
        mask = np.zeros((8, ny, nx), np.uint8)
        for z in range(8):
            d2 = (yy - 24) ** 2 + (xx - cx) ** 2
            ct[z] = -1000 + 1200 / (1 + np.exp((np.sqrt(d2) - 5) / 0.8))
            ct[z] += intensity_shift
            mask[z] = d2 <= 25
        return (from_array(ct, spacing=(1.0, 1.0, 2.0)),
                from_array(mask, spacing=(1.0, 1.0, 2.0)))

    target_ct, _ = case(24.0)
    atlas_set = {}
    for i, cx in enumerate([24.5, 23.5, 34.0]):  # third is 10 voxels off
        ct_i, m_i = case(cx)
        atlas_set[str(i)] = {"DIR": {"CT Image": ct_i, "V": m_i}}

    prob = fused_vessel_probability(target_ct, atlas_set, "V")
    pts = com_from_probability(prob, scan_direction="z",
                               prob_threshold=0.3, min_mass=2.0)
    assert len(pts) == 8
    xs = np.array([p[0] for p in pts])
    # unweighted mean of the three tubes would sit at ~27.3; the weighted
    # fusion must stay within a voxel of the agreeing pair (24.0)
    assert np.all(np.abs(xs - 24.0) < 1.0), xs


def test_vessel_spline_generation_fused_probability_path():
    """com_source="fused_probability" through the public generation API:
    recovers the consensus tube of two agreeing atlases despite a third
    mis-registered one."""
    from platipy_tpu.label.comparison import compute_metric_dsc
    from platipy_tpu.utils.vessel import vessel_spline_generation

    ny = nx = 48
    yy, xx = np.mgrid[:ny, :nx].astype(np.float32)

    def case(shift):
        ct = np.zeros((24, ny, nx), np.float32)
        mask = np.zeros((24, ny, nx), np.uint8)
        for z in range(24):
            cy, cx = 24 + 4 * np.sin(z / 8.0), 24 + shift
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            ct[z] = -1000 + 1200 / (1 + np.exp((np.sqrt(d2) - 4) / 0.8))
            mask[z] = d2 <= 16
        return (from_array(ct, spacing=(1.0, 1.0, 2.0)),
                from_array(mask, spacing=(1.0, 1.0, 2.0)))

    target_ct, target_mask = case(0.0)
    atlas_set = {}
    for i, shift in enumerate([0.5, -0.5, 8.0]):
        ct_i, m_i = case(shift)
        atlas_set[str(i)] = {"DIR": {"CT Image": ct_i, "VESSEL": m_i}}

    out = vessel_spline_generation(
        target_ct, atlas_set, ["VESSEL"],
        vessel_radius_mm_dict={"VESSEL": 4},
        stop_condition_type_dict={"VESSEL": "count"},
        stop_condition_value_dict={"VESSEL": 2},
        scan_direction_dict={"VESSEL": "z"},
        com_source="fused_probability",
        prob_threshold=0.4,
        spline_smoothing=0.1,
    )
    dsc = float(compute_metric_dsc(target_mask, out["VESSEL"]))
    assert dsc > 0.85, dsc


def test_vessel_spline_unsatisfiable_stop_condition_returns_empty():
    """A stop count >= the number of contributing atlases (e.g. after IAR
    pruned the set) must yield an EMPTY delineation with a warning — not a
    crash (regression: the bench's cardiac pipeline hit this on-device)."""
    from platipy_tpu.utils.vessel import vessel_spline_generation

    arr = np.zeros((16, 24, 24), np.uint8)
    arr[:, 10:14, 10:14] = 1
    img = from_array(arr, spacing=(1.0, 1.0, 1.0))
    atlas_set = {str(i): {"DIR": {"V": img}} for i in range(2)}
    out = vessel_spline_generation(
        img, atlas_set, ["V"],
        vessel_radius_mm_dict={"V": 3},
        stop_condition_type_dict={"V": "count"},
        stop_condition_value_dict={"V": 5},
        scan_direction_dict={"V": "z"},
    )
    assert int(np.asarray(out["V"].array).sum()) == 0


def test_write_nrrd_structure_set():
    """Slicer segmentation NRRD: header fields + gzip payload round-trip.

    The payload is F-order over [struct, x, y, z] (struct fastest, matching
    ``sizes``); decode accordingly."""
    from platipy_tpu.utils.io import write_nrrd_structure_set

    a = insert_sphere_image(_empty((24, 32, 32), (1.0, 1.0, 2.0)), sp_radius=6,
                            sp_centre=(12, 16, 16))
    b = insert_sphere_image(_empty((24, 32, 32), (1.0, 1.0, 2.0)), sp_radius=4,
                            sp_centre=(12, 20, 20))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ss.nrrd")
        write_nrrd_structure_set({"A": a, "B": b}, output_file=path)
        raw = open(path, "rb").read()
        head, _, payload = raw.partition(b"\n\n")
        header = head.decode()
        assert header.startswith("NRRD0005")
        assert "sizes: 2 32 32 24" in header
        assert "Segment0_Name:=A" in header
        assert "Segment1_Name:=B" in header
        assert "encoding: gzip" in header
        data = np.frombuffer(gzip.decompress(payload), np.uint8)
        # F-order [s,x,y,z] == C-order [z,y,x,s]
        stack = data.reshape(24, 32, 32, 2).transpose(3, 0, 1, 2)
        np.testing.assert_array_equal(stack[0], np.asarray(a.array) > 0)
        np.testing.assert_array_equal(stack[1], np.asarray(b.array) > 0)


def test_rotate_image_and_vector_angle():
    """90-degree rotation about the x-axis through the volume centre moves a
    +y offset into z (analytic oracle); vector_angle is exact."""
    from platipy_tpu.utils.geometry import rotate_image, vector_angle

    assert vector_angle((1, 0, 0), (0, 1, 0)) == pytest.approx(np.pi / 2)
    assert vector_angle((1, 0, 0), (-1, 0, 0), smallest=True) == pytest.approx(
        0.0, abs=1e-6)

    img = _empty((32, 32, 32))
    img = insert_sphere_image(img, sp_radius=3, sp_centre=(16, 24, 16))
    centre = (16.0, 16.0, 16.0)  # physical (x, y, z) of the volume centre
    rot = rotate_image(img, rotation_centre=centre, rotation_axis=(1, 0, 0),
                       rotation_angle_radians=np.pi / 2)
    zz, yy, xx = np.nonzero(np.asarray(rot.array))
    assert abs(xx.mean() - 16) < 1.5
    # the +8-voxel y offset rotates into a +/-8-voxel z offset
    assert abs(yy.mean() - 16) < 1.5
    assert abs(zz.mean() - 16) > 5.0


def test_vessel_end_trim_and_clip_to_extent():
    """end_trim excludes noisy end COMs from the spline fit but the straight
    end extension recovers the observed extent; clip_to_extent removes the
    hemispherical end caps beyond the chain extent (both EXTENSIONS,
    default-off reference parity)."""
    from platipy_tpu.utils.vessel import vessel_spline_generation

    # straight tube along z with DISPLACED outermost end slices (the noisy
    # end-COM regime of full-FOV multi-atlas registration)
    arr = np.zeros((48, 64, 64), np.uint8)
    yy, xx = np.mgrid[:64, :64]
    for z in range(6, 42):
        cy, cx = 32, 30
        if z in (6, 7, 40, 41):
            cy, cx = 38, 36  # ~8.5 px lateral error at the ends
        arr[z][(yy - cy) ** 2 + (xx - cx) ** 2 <= 4.0**2] = 1
    img = from_array(arr, spacing=(1.0, 1.0, 2.0))
    atlas_set = {"0": {"DIR": {"VESSEL": img}}}

    kw = dict(
        vessel_radius_mm_dict={"VESSEL": 4},
        stop_condition_type_dict={"VESSEL": "count"},
        stop_condition_value_dict={"VESSEL": 0},
        scan_direction_dict={"VESSEL": "z"},
    )
    base = vessel_spline_generation(img, atlas_set, ["VESSEL"], **kw)["VESSEL"]
    fixed = vessel_spline_generation(
        img, atlas_set, ["VESSEL"], end_trim=3, clip_to_extent=True, **kw
    )["VESSEL"]

    truth = np.zeros_like(arr)
    for z in range(6, 42):
        truth[z][(yy - 32) ** 2 + (xx - 30) ** 2 <= 4.0**2] = 1

    def dsc(a, b):
        a, b = np.asarray(a) > 0, np.asarray(b) > 0
        return 2 * (a & b).sum() / max(a.sum() + b.sum(), 1)

    base_arr = np.asarray(base.array)
    fixed_arr = np.asarray(fixed.array)
    # clip: nothing beyond the chain extent (base has end caps / end wander)
    assert fixed_arr[:6].sum() == 0 and fixed_arr[42:].sum() == 0
    # end handling recovers the straight tube better than the raw fit
    assert dsc(fixed_arr, truth) > dsc(base_arr, truth) + 0.02
    assert dsc(fixed_arr, truth) > 0.9


def test_vessel_end_trim_and_clip_x_scan():
    """end_trim/clip_to_extent along the x scan direction (the reference
    scans LCORONARYARTERY along x: cardiac run.py scan_direction_dict)."""
    from platipy_tpu.utils.vessel import vessel_spline_generation

    arr = np.zeros((48, 64, 64), np.uint8)
    zz, yy = np.mgrid[:48, :64]
    for x in range(6, 42):
        cz, cy = 24, 30
        if x in (6, 7, 40, 41):
            cz, cy = 30, 36  # displaced end slices
        arr[:, :, x][(zz - cz) ** 2 + (yy - cy) ** 2 <= 4.0**2] = 1
    # (x,y,z) spacing: scan axis x at 2 mm, ISOTROPIC 1 mm (z,y) cross-section
    img = from_array(arr, spacing=(2.0, 1.0, 1.0))
    atlas_set = {"0": {"DIR": {"VESSEL": img}}}

    kw = dict(
        vessel_radius_mm_dict={"VESSEL": 4},
        stop_condition_type_dict={"VESSEL": "count"},
        stop_condition_value_dict={"VESSEL": 0},
        scan_direction_dict={"VESSEL": "x"},
    )
    fixed = vessel_spline_generation(
        img, atlas_set, ["VESSEL"], end_trim=3, clip_to_extent=True, **kw
    )["VESSEL"]
    fixed_arr = np.asarray(fixed.array)
    # clipped along x to the chain extent
    assert fixed_arr[:, :, :6].sum() == 0 and fixed_arr[:, :, 42:].sum() == 0

    truth = np.zeros_like(arr)
    for x in range(6, 42):
        truth[:, :, x][(zz - 24) ** 2 + (yy - 30) ** 2 <= 4.0**2] = 1

    a, b = fixed_arr > 0, truth > 0
    dsc = 2 * (a & b).sum() / max(a.sum() + b.sum(), 1)
    assert dsc > 0.9
