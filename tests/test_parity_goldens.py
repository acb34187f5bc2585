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
