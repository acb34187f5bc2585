"""Registration parity pack: analytic oracles + recorded goldens.

BASELINE.md's north-star gate is "DSC within 0.01 of the reference (SimpleITK)
outputs"; SimpleITK does not exist in this environment, so parity is pinned
three ways instead:

1. **The reference's own published acceptance case** — the exact synthetic
   5-case fixture from /root/reference/platipy/imaging/tests/test_cardiac.py:36-142
   (128x128x60, radius-25 spheres, jittered spacing, origin (320,-52,60)) at
   the reference's own recorded bar: held-out DSC > 0.99.
2. **Analytic oracles** — registrations of synthetically transformed images
   must recover the KNOWN transform (ground truth independent of both
   implementations).
3. **Recorded goldens** — the outputs of this framework's registration on
   fixed deterministic inputs, pinned tightly so any behavioural drift
   between rounds fails loudly.

All tests run on the virtual-CPU backend (tests/conftest.py), so the numbers
are deterministic across machines.
"""

import copy
import logging
import tempfile
from pathlib import Path

import numpy as np
import pytest

from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere
from platipy_tpu.label.comparison import compute_metric_dsc

logger = logging.getLogger(__name__)


def _textured_sphere(shape, radius, centre, spacing):
    """Deterministic textured phantom: sigmoid sphere + sinusoidal texture."""
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float32)
    r = np.sqrt(
        ((zz - centre[0]) * spacing[2]) ** 2
        + ((yy - centre[1]) * spacing[1]) ** 2
        + ((xx - centre[2]) * spacing[0]) ** 2
    )
    body = 1.0 / (1.0 + np.exp((r - radius) / 1.5))
    tex = 80 * np.sin(0.45 * zz) * np.cos(0.3 * yy) + 60 * np.sin(0.25 * xx)
    return (-1000 + body * (1040 + tex)).astype(np.float32)


SPACING = (1.0, 1.0, 2.0)
SHAPE = (32, 64, 64)


@pytest.fixture(scope="module")
def phantom_pair():
    fixed = from_array(
        _textured_sphere(SHAPE, 18.0, (16, 32, 32), SPACING), spacing=SPACING
    )
    # shifted by (3, 5, -5) voxels = (x, y, z) = (+5, -5, -6) mm
    moving = from_array(
        _textured_sphere(SHAPE, 18.0, (13, 27, 37), SPACING), spacing=SPACING
    )
    return fixed, moving


def test_linear_translation_analytic_oracle(phantom_pair):
    """Translation registration recovers a known shift to < 0.2 mm — ground
    truth independent of any reference implementation."""
    from platipy_tpu.registration.linear import linear_registration

    fixed, moving = phantom_pair
    reg, tfm = linear_registration(
        fixed, moving, reg_method="translation", metric="mean_squares",
        optimiser="gradient_descent_line_search", shrink_factors=[4, 2, 1],
        smooth_sigmas=[2, 1, 0], sampling_rate=0.75, number_of_iterations=30,
        default_value=-1000,
    )
    translation = np.asarray(tfm.as_matrix())[:3, 3]
    np.testing.assert_allclose(translation, [5.0, -5.0, -6.0], atol=0.2)
    err = np.abs(np.asarray(reg.array) - np.asarray(fixed.array))
    assert float(err.mean()) < 10.0  # residual is interpolation-level only


def test_linear_rigid_recorded_golden(phantom_pair):
    """Rigid registration output pinned to the recorded golden matrix: any
    drift in optimiser/metric/sampling behaviour fails this test."""
    from platipy_tpu.registration.linear import linear_registration

    fixed, moving = phantom_pair
    reg, tfm = linear_registration(
        fixed, moving, reg_method="rigid", metric="mean_squares",
        optimiser="gradient_descent_line_search", shrink_factors=[4, 2],
        smooth_sigmas=[0, 0], sampling_rate=0.75, number_of_iterations=25,
        default_value=-1000,
    )
    golden = np.array([
        [0.99915, 0.02508, 0.03270, 3.07941],
        [-0.02482, 0.99966, -0.00814, -3.93264],
        [-0.03289, 0.00732, 0.99943, -5.16158],
        [0.0, 0.0, 0.0, 1.0],
    ])
    np.testing.assert_allclose(np.asarray(tfm.as_matrix()), golden, atol=2e-3)
    err = np.abs(np.asarray(reg.array) - np.asarray(fixed.array))
    np.testing.assert_allclose(float(err.mean()), 6.229, atol=0.5)


def test_demons_dvf_recorded_goldens(phantom_pair):
    """Demons on a known synthetic expansion: the recovered DVF's statistics
    and the propagated-structure DSC are pinned (plus the analytic bar that
    the deformed structure maps back onto the original)."""
    from platipy_tpu.core.interp import INTERP_NEAREST
    from platipy_tpu.generation.dvf import generate_field_expand
    from platipy_tpu.registration.deformable import (
        fast_symmetric_forces_demons_registration,
    )
    from platipy_tpu.registration.utils import apply_transform

    fixed, _ = phantom_pair
    mask = fixed.with_array(
        (np.asarray(fixed.array) > -500).astype(np.uint8)
    )
    m_def, t_def, _dvf = generate_field_expand(
        mask, bone_mask=False, expand=3, gaussian_smooth=4
    )
    warped_ct = apply_transform(fixed, transform=t_def, default_value=-1000)

    reg, t_demons, dvf_rec = fast_symmetric_forces_demons_registration(
        fixed, warped_ct, resolution_staging=[4, 2], iteration_staging=[20, 20],
        smoothing_sigmas=[0, 0], default_value=-1000,
    )
    mag = np.linalg.norm(np.asarray(dvf_rec.array), axis=-1)
    # recorded goldens (virtual-CPU backend)
    np.testing.assert_allclose(float(mag.mean()), 1.1119, rtol=0.02)
    np.testing.assert_allclose(float(mag.max()), 3.6107, rtol=0.05)
    err = np.abs(np.asarray(reg.array) - np.asarray(fixed.array))
    np.testing.assert_allclose(float(err.mean()), 5.086, rtol=0.1)

    # analytic oracle: the deformed structure propagates back onto the
    # original through the recovered field
    warped_mask = apply_transform(
        m_def, transform=t_demons, interpolator=INTERP_NEAREST
    )
    dsc = float(compute_metric_dsc(mask, warped_mask))
    np.testing.assert_allclose(dsc, 0.9773, atol=0.005)
    assert dsc > 0.95


@pytest.mark.slow
def test_reference_published_cardiac_case():
    """The EXACT published reference acceptance case
    (/root/reference/platipy/imaging/tests/test_cardiac.py:36-142): 5 radius-25
    sphere phantoms at 128x128x60 with per-case spacing jitter, reference
    test settings, held-out case segmented at the reference's own recorded
    bar DSC > 0.99."""
    from platipy_tpu.nifti.io import write_image
    from platipy_tpu.projects.cardiac.run import (
        CARDIAC_SETTINGS_DEFAULTS,
        run_cardiac_segmentation,
    )

    data = {}
    for i in range(5):
        case_id = str(i + 1).zfill(3)
        sphere = insert_sphere(
            np.zeros((60, 128, 128)), sp_radius=25, sp_centre=(30 + i, 64 + i, 64)
        )
        ct_arr = np.where(sphere > 0, 1.0, -1000.0)
        spacing = (0.9 + i * 0.01, 0.9 + i * 0.01, 2.5 + i * 0.01)
        origin = (320, -52, 60)
        data[case_id] = {
            "CT": from_array(ct_arr.astype(np.float32), origin=origin,
                             spacing=spacing),
            "WHOLEHEART": from_array(sphere.astype(np.uint8), origin=origin,
                                     spacing=spacing),
        }

    with tempfile.TemporaryDirectory() as working_dir:
        wp = Path(working_dir)
        cases = list(data)
        for case, cd in data.items():
            p = wp / f"Case_{case}" / "Images" / f"Case_{case}_CROP.nii.gz"
            p.parent.mkdir(parents=True, exist_ok=True)
            write_image(cd["CT"], str(p))
            p = (wp / f"Case_{case}" / "Structures"
                 / f"Case_{case}_WHOLEHEART_CROP.nii.gz")
            p.parent.mkdir(parents=True, exist_ok=True)
            write_image(cd["WHOLEHEART"], str(p))

        s = copy.deepcopy(CARDIAC_SETTINGS_DEFAULTS)
        s["atlas_settings"]["atlas_id_list"] = cases[:-1]
        s["atlas_settings"]["atlas_path"] = str(wp)
        s["atlas_settings"]["atlas_structure_list"] = ["WHOLEHEART"]
        s["atlas_settings"]["auto_crop_atlas"] = False
        s["deformable_registration_settings"]["resolution_staging"] = [8, 4, 2]
        s["deformable_registration_settings"]["iteration_staging"] = [5, 5, 5]
        s["deformable_registration_settings"]["smoothing_sigmas"] = [0, 0, 0]
        s["deformable_registration_settings"]["default_value"] = -1000
        s["iar_settings"]["reference_structure"] = None
        s["label_fusion_settings"]["optimal_threshold"] = {"WHOLEHEART": 0.5}
        s["vessel_spline_settings"]["vessel_name_list"] = []
        s["vessel_spline_settings"]["vessel_radius_mm_dict"] = {}
        s["vessel_spline_settings"]["scan_direction_dict"] = {}
        s["vessel_spline_settings"]["stop_condition_type_dict"] = {}
        s["vessel_spline_settings"]["stop_condition_value_dict"] = {}
        s["postprocessing_settings"]["run_postprocessing"] = False
        s["geometric_segmentation_settings"]["run_geometric_algorithms"] = False
        s["linear_registration_settings"] = dict(
            s["linear_registration_settings"],
            shrink_factors=[2, 1], smooth_sigmas=[0, 0], sampling_rate=0.75,
            default_value=-1024, number_of_iterations=5,
            metric="mean_squares", optimiser="gradient_descent_line_search",
        )

        infer = cases[-1]
        output, _ = run_cardiac_segmentation(data[infer]["CT"], settings=s)
        assert "WHOLEHEART" in output
        dsc = float(compute_metric_dsc(data[infer]["WHOLEHEART"],
                                       output["WHOLEHEART"]))
        logger.info("reference-case WHOLEHEART DSC: %.5f", dsc)
        assert dsc > 0.99


# ---------------------------------------------------------------------------
# Round-3 oracles: the subtlest ITK-semantics corners, pinned analytically
# (VERDICT r2 item 8)
# ---------------------------------------------------------------------------


def test_mattes_mi_closed_form_on_correlated_gaussians():
    """Parzen-binned Mattes MI vs the bivariate-Gaussian closed form
    MI = -0.5 ln(1 - rho^2) — ground truth independent of both this
    implementation and ITK's (reference metric selection linear.py:141-148).

    The estimator carries the known Parzen-window smoothing bias
    (underestimates, growing with rho); tolerances bracket that bias at
    bins=50, n=200k (measured -0.0007/-0.0038/-0.0497 nats)."""
    import jax.numpy as jnp

    from platipy_tpu.registration.metrics import mattes_mi

    rng = np.random.RandomState(3)
    n = 200_000
    z1 = rng.randn(n).astype(np.float32)
    z2 = rng.randn(n).astype(np.float32)

    estimates = {}
    for rho, tol in ((0.3, 0.012), (0.6, 0.02), (0.9, 0.08)):
        f = z1
        m = rho * z1 + np.sqrt(1 - rho * rho) * z2
        analytic = -0.5 * np.log(1 - rho * rho)
        est = -float(mattes_mi(jnp.asarray(f), jnp.asarray(m), bins=50))
        estimates[rho] = est
        assert abs(est - analytic) < tol, (rho, est, analytic)
        # Parzen smoothing can only LOSE information
        assert est < analytic + 1e-3, (rho, est, analytic)

    # strictly monotone in dependence strength
    assert estimates[0.3] < estimates[0.6] < estimates[0.9]

    # MI is invariant under affine intensity remapping (the property that
    # makes it the multi-modality metric)
    f = z1
    m = 0.9 * z1 + np.sqrt(1 - 0.81) * z2
    est1 = -float(mattes_mi(jnp.asarray(f), jnp.asarray(m), bins=50))
    est2 = -float(
        mattes_mi(jnp.asarray(2.5 * f + 100), jnp.asarray(-3.0 * m + 7), bins=50)
    )
    assert abs(est1 - est2) < 5e-3, (est1, est2)


def test_joint_hist_mi_is_distinct_and_sane():
    """joint_hist_mi implements ITK's JointHistogramMutualInformation
    semantics (reference linear.py:146-148; SimpleITK defaults bins=20,
    varianceForJointPDFSmoothing=1.5): tent-binned joint histogram with
    2-bin padding + Gaussian PDF smoothing.  Checked against the
    bivariate-Gaussian closed form MI = -0.5 ln(1 - rho^2): the heavy ITK
    smoothing biases the estimate low (information inequality), but the
    metric stays strictly monotone in dependence and affine-invariant —
    and is NOT the Mattes estimator."""
    import jax.numpy as jnp

    from platipy_tpu.registration.metrics import joint_hist_mi, mattes_mi

    rng = np.random.RandomState(3)
    n = 200_000
    z1 = rng.randn(n).astype(np.float32)
    z2 = rng.randn(n).astype(np.float32)

    estimates = {}
    for rho, floor in ((0.3, 0.012), (0.6, 0.055), (0.9, 0.13)):
        f = z1
        m = rho * z1 + np.sqrt(1 - rho * rho) * z2
        analytic = -0.5 * np.log(1 - rho * rho)
        est = -float(joint_hist_mi(jnp.asarray(f), jnp.asarray(m)))
        estimates[rho] = est
        # smoothing can only LOSE information...
        assert est < analytic + 1e-3, (rho, est, analytic)
        # ...but must retain a usable signal (measured 0.019/0.080/0.187
        # nats vs analytic 0.047/0.223/0.830 — the variance-1.5 PDF
        # smoothing at 20 bins is a strong low-pass, exactly as in ITK)
        assert est > floor, (rho, est, analytic)
        # and must NOT be the Mattes estimator at the same bin count
        mt = -float(mattes_mi(jnp.asarray(f), jnp.asarray(m), bins=20))
        assert abs(est - mt) > 0.01, (rho, est, mt)

    assert estimates[0.3] < estimates[0.6] < estimates[0.9]

    # invariance under affine intensity remapping
    f = z1
    m = 0.9 * z1 + np.sqrt(1 - 0.81) * z2
    est1 = -float(joint_hist_mi(jnp.asarray(f), jnp.asarray(m)))
    est2 = -float(
        joint_hist_mi(jnp.asarray(2.5 * f + 100), jnp.asarray(-3.0 * m + 7))
    )
    assert abs(est1 - est2) < 5e-3, (est1, est2)


def test_registration_converges_under_joint_hist_mi():
    """A translation registration recovers a known shift under the
    joint-histogram MI metric across a NONLINEAR intensity remap (where
    mean-squares has no valid optimum) — the multi-modality use case the
    reference selects this metric for (linear.py:146-148)."""
    from scipy.ndimage import gaussian_filter

    from platipy_tpu.core.image import from_array
    from platipy_tpu.registration.linear import linear_registration

    rng = np.random.RandomState(0)
    base = gaussian_filter(rng.rand(32, 48, 48).astype(np.float32), 3) * 1000
    fixed = from_array(base, spacing=(1.5, 1.5, 2.0))
    # moving = base shifted (+4 y, -3 x) voxels, then monotone-nonlinearly
    # remapped — the truth pull-back translation is (x,y,z) = (-4.5, 6, 0) mm
    shifted = np.roll(base, shift=(0, 4, -3), axis=(0, 1, 2))
    moving_arr = (np.sqrt(shifted - shifted.min() + 1.0) * 50).astype(np.float32)
    moving = from_array(moving_arr, spacing=(1.5, 1.5, 2.0))

    _, tfm = linear_registration(
        fixed, moving, reg_method="translation", metric="joint_hist_mi",
        optimiser="gradient_descent_line_search", shrink_factors=[4, 2],
        smooth_sigmas=[0, 0], sampling_rate=1.0, number_of_iterations=40,
    )
    t = np.asarray(tfm.transforms[-1].translation)
    # np.roll wraps at the faces, which perturbs the optimum by ~half a voxel
    np.testing.assert_allclose(t, [-4.5, 6.0, 0.0], atol=2.0)


def test_displacement_field_composition_order_oracle():
    """The multiscale driver's composition (reference deformable.py:151-154)
    pulls the per-level increment through the running transform BEFORE
    accumulating:  u_new(x) = u1(x) + u2(x + u1(x)).

    Oracle: u1 constant, u2 linear — the composition has the closed form
    u1 + B((x + u1) - c), exact under trilinear interpolation.  The naive
    additive accumulation u1 + u2 must NOT match (guards against regressing
    the order subtlety)."""
    import jax.numpy as jnp

    from platipy_tpu.registration.deformable import compose_displacement_fields

    shape = (16, 20, 24)
    spacing = (1.5, 2.0, 2.5)
    img0 = from_array(np.zeros(shape, np.float32), spacing=spacing)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float32)
    P = np.stack([xx * spacing[0], yy * spacing[1], zz * spacing[2]], axis=-1)

    a = np.array([2.0, -1.5, 1.0], np.float32)
    B = np.array(
        [[0.05, 0.02, 0.0], [0.0, -0.04, 0.01], [0.02, 0.0, 0.03]], np.float32
    )
    c = np.array([20.0, 15.0, 10.0], np.float32)
    u1 = np.broadcast_to(a, P.shape).astype(np.float32)
    u2 = ((P - c) @ B.T).astype(np.float32)

    tot = compose_displacement_fields(
        img0.with_array(jnp.asarray(u1.copy())), img0.with_array(jnp.asarray(u2))
    )
    expected = u1 + ((P + u1) - c) @ B.T
    interior = (slice(2, -2),) * 3
    got = np.asarray(tot.array)
    np.testing.assert_allclose(got[interior], expected[interior], atol=1e-5)

    naive = u1 + u2
    assert np.abs(naive[interior] - expected[interior]).max() > 0.05


@pytest.mark.slow
def test_bspline_ffd_recovers_known_coefficient_grid():
    """bspline_registration must recover a KNOWN synthetic FFD (reference
    deformable.py:309-547): a ~3 mm-peak smooth coefficient grid deforms a
    textured volume; the registered transform's displacement field is compared
    against the known one at textured points (where the metric has signal)."""
    from scipy.ndimage import gaussian_filter
    import jax.numpy as jnp

    from platipy_tpu.core.transform import BSplineTransform
    from platipy_tpu.registration.deformable import bspline_registration
    from platipy_tpu.registration.utils import apply_transform

    shape = (32, 48, 48)
    spacing = (2.0, 2.0, 2.0)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float32)
    tex = (
        100 * np.sin(0.35 * xx) * np.cos(0.28 * yy)
        + 80 * np.sin(0.22 * zz + 0.15 * xx)
        + 60 * np.cos(0.3 * yy + 0.2 * zz)
    )
    body = np.exp(
        -(((xx - 24) / 20) ** 2 + ((yy - 24) / 20) ** 2 + ((zz - 16) / 13) ** 2)
    )
    moving = from_array((tex * body).astype(np.float32), spacing=spacing)

    extent = np.array([shape[2], shape[1], shape[0]]) * np.array(spacing)
    mesh = np.maximum((extent / 24.0).astype(int), 1)
    grid_spacing = extent / mesh
    grid_origin = -grid_spacing
    grid_shape = (int(mesh[2]) + 3, int(mesh[1]) + 3, int(mesh[0]) + 3)

    rngc = np.random.RandomState(11)
    coeffs = rngc.randn(*grid_shape, 3).astype(np.float32)
    for ch in range(3):
        coeffs[..., ch] = gaussian_filter(coeffs[..., ch], 1.2)
    probe = np.stack(
        np.meshgrid(
            np.arange(0, 96, 4.0), np.arange(0, 96, 4.0), np.arange(0, 64, 4.0),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    t_tmp = BSplineTransform(jnp.asarray(coeffs), grid_origin, grid_spacing)
    peak = np.abs(np.asarray(t_tmp.displacement(jnp.asarray(probe)))).max()
    coeffs *= 3.0 / peak
    t_known = BSplineTransform(jnp.asarray(coeffs), grid_origin, grid_spacing)

    fixed = apply_transform(
        moving, transform=t_known, default_value=0.0, interpolator=2
    )

    _, t_rec = bspline_registration(
        fixed,
        moving,
        resolution_staging=(4, 2),
        smooth_sigmas=(2, 0),
        grid_scale_factors=(1, 1),
        initial_grid_spacing=24,
        number_of_iterations=80,
        optimiser="LBFGS",
        metric="mean_squares",
        default_value=0.0,
    )

    pts = np.stack(
        np.meshgrid(
            np.arange(12, 84, 4.0), np.arange(12, 84, 4.0), np.arange(8, 56, 4.0),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    bw = np.exp(
        -(((pts[:, 0] / 2 - 24) / 20) ** 2
          + ((pts[:, 1] / 2 - 24) / 20) ** 2
          + ((pts[:, 2] / 2 - 16) / 13) ** 2)
    )
    pts = pts[bw > 0.3]
    d_known = np.asarray(t_known.displacement(jnp.asarray(pts)))
    d_rec = np.asarray(t_rec.displacement(jnp.asarray(pts)))
    err = np.linalg.norm(d_known - d_rec, axis=1)
    mean_disp = np.linalg.norm(d_known, axis=1).mean()
    logger.info(
        "FFD recovery: field mean %.2f mm; err mean %.3f p95 %.3f max %.3f",
        mean_disp, err.mean(), np.percentile(err, 95), err.max(),
    )
    # measured on the pinned inputs: mean 0.228, p95 0.473, max 0.902
    assert err.mean() < 0.35
    assert np.percentile(err, 95) < 0.7
    assert err.max() < 1.2
