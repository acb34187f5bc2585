"""Bronchus pipeline, dose analysis, and B-spline registration tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere


def _lung_phantom(shape=(48, 64, 64), spacing=(1.5, 1.5, 2.0)):
    """Synthetic thorax: body at 0 HU, two lungs at -800, trachea at -990
    splitting into two bronchi below the carina."""
    arr = np.full(shape, -1000.0, np.float32)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    # body ellipse
    body = (((yy - 32) / 28.0) ** 2 + ((xx - 32) / 30.0) ** 2) < 1
    arr[body] = 0.0
    # lungs
    lung_l = (((zz - 20) / 16.0) ** 2 + ((yy - 32) / 12.0) ** 2 + ((xx - 18) / 9.0) ** 2) < 1
    lung_r = (((zz - 20) / 16.0) ** 2 + ((yy - 32) / 12.0) ** 2 + ((xx - 46) / 9.0) ** 2) < 1
    arr[lung_l | lung_r] = -800.0
    # trachea: vertical tube from the top to the carina at z=28
    trachea = ((yy - 32) ** 2 + (xx - 32) ** 2 < 9) & (zz >= 28)
    # bronchi below the carina, branching to each lung
    bl = ((yy - 32) ** 2 + (xx - 32 + (28 - zz)) ** 2 < 6) & (zz < 28) & (zz > 8)
    br = ((yy - 32) ** 2 + (xx - 32 - (28 - zz)) ** 2 < 6) & (zz < 28) & (zz > 8)
    arr[trachea | bl | br] = -990.0
    return from_array(arr, spacing=spacing)


def test_bronchus_segmentation():
    from platipy_tpu.projects.bronchus.run import run_bronchus_segmentation

    img = _lung_phantom()
    results = run_bronchus_segmentation(
        img,
        settings={
            "outputBronchusName": "Auto_Bronchus",
            "outputLungName": "Auto_Lung",
            "algorithmSettings": {
                "fast_mode": True,
                "extend_from_carina_mm": 20,
                "minimum_tree_half_physical_size": 50,
                "lung_mask_hu_values": [-900, -950],
                "distance_from_supu_slice_values": [3, 10],
                "expected_physical_size_range": [300, 50000],
            },
        },
    )
    assert "Auto_Lung" in results
    assert results["Auto_Lung"] is not None
    assert "Auto_Bronchus" in results
    bronchus = np.asarray(results["Auto_Bronchus"].array)
    assert bronchus.sum() > 0
    # trachea present just above the carina (z=28), but cropped 20mm above it
    assert bronchus[30, 32, 32] > 0
    assert bronchus[45].sum() == 0  # superior extent removed (carina + 20mm)
    # bronchi reach into both sides below the carina
    assert bronchus[20, :, :32].sum() > 0 and bronchus[20, :, 32:].sum() > 0


def test_dvh_and_dose_metrics():
    from platipy_tpu.dose.dvh import (
        calculate_d_cc_x,
        calculate_d_x,
        calculate_dvh_for_labels,
        calculate_v_x,
    )
    from platipy_tpu.dose.metric import (
        calculate_d_mean,
        calculate_d_to_volume_for_labels,
        calculate_v_receiving_dose_for_labels,
    )

    shape = (20, 24, 24)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    # linear dose gradient 0 -> 60 Gy along z
    dose = from_array((zz / (shape[0] - 1) * 60).astype(np.float32), spacing=(2, 2, 2))
    mask = np.zeros(shape, np.uint8)
    mask[5:15, 8:16, 8:16] = 1
    label = from_array(mask, spacing=(2, 2, 2))

    labels = {"PTV": label}
    dvh = calculate_dvh_for_labels(dose, labels, bin_width=0.5)
    assert "PTV" in dvh.label.values
    cc_expected = mask.sum() * 8 / 1000
    assert dvh.cc.iloc[0] == pytest.approx(cc_expected)
    # mean dose of slab z in [5,15): mean of (5..14)/19*60 = 30
    assert dvh["mean"].iloc[0] == pytest.approx(30.0, abs=1.0)

    d50 = calculate_d_x(dvh, 50)["D50"].iloc[0]
    assert d50 == pytest.approx(30.0, abs=1.5)
    v30 = calculate_v_x(dvh, 30.0)
    assert v30.iloc[0, 1] == pytest.approx(cc_expected / 2, rel=0.15)
    dcc = calculate_d_cc_x(dvh, 1)
    assert dcc["D1cc"].iloc[0] > d50

    assert calculate_d_mean(dose, label) == pytest.approx(30.0, abs=1.0)
    df = calculate_d_to_volume_for_labels(dose, labels, [50])
    assert df["D50"].iloc[0] == pytest.approx(30.0, abs=1.5)
    vf = calculate_v_receiving_dose_for_labels(dose, labels, [30.0])
    assert vf.iloc[0, 1] == pytest.approx(50.0, abs=10.0)


def test_bspline_registration_improves_alignment():
    from platipy_tpu.label.comparison import compute_metric_dsc
    from platipy_tpu.registration.deformable import bspline_registration

    fixed_arr = insert_sphere(np.full((24, 32, 32), -1000.0), 9, (12, 16, 16))
    moving_arr = insert_sphere(np.full((24, 32, 32), -1000.0), 7, (12, 16, 16))
    fixed = from_array(fixed_arr.astype(np.float32) + 1000, spacing=(2, 2, 2))
    moving = from_array(moving_arr.astype(np.float32) + 1000, spacing=(2, 2, 2))

    registered, tfm = bspline_registration(
        fixed,
        moving,
        resolution_staging=[2],
        smooth_sigmas=[0],
        grid_scale_factors=[1],
        initial_grid_spacing=24,
        optimiser="gradient_descent",
        number_of_iterations=30,
        default_value=0,
        interp_order=2,
    )
    f_mask = from_array((fixed_arr > -500).astype(np.uint8), spacing=(2, 2, 2))
    m_mask = from_array((moving_arr > -500).astype(np.uint8), spacing=(2, 2, 2))
    r_mask = from_array(
        (np.asarray(registered.array) > 500).astype(np.uint8), spacing=(2, 2, 2)
    )
    d0 = compute_metric_dsc(f_mask, m_mask)
    d1 = compute_metric_dsc(f_mask, r_mask)
    assert d1 > d0, f"bspline did not improve: {d0} -> {d1}"

def test_api_parity_symbols(tmp_path):
    """Reference public symbols that must exist and function
    (crawl.py:33-41, cardiac/run.py:428-470, nnunet/run.py:74-102,
    visualisation/utils.py:26-35,305-368, animation.py:38-54)."""
    import numpy as np

    from platipy_tpu import from_array
    from platipy_tpu.registration.utils import stage_iteration
    from platipy_tpu.label.utils import generate_primes
    from platipy_tpu.projects.cardiac.run import (
        display_open_cardiac_zip_url_locations,
        install_atlas_from_zipfile,
        install_hybrid_cardiac_from_zip,
    )
    from platipy_tpu.projects.nnunet.run import (
        download_and_install_nnunet_task,
        install_nnunet_model_from_zip,
    )
    from platipy_tpu.visualisation.animation import FileWriter
    from platipy_tpu.visualisation.utils import (
        VisualiseImage, project_onto_arbitrary_plane,
    )
    from platipy_tpu.utils.vessel import (
        convert_simpleitk_to_vtk, write_vtk_tube_to_file,
    )

    stage_iteration(6)
    display_open_cardiac_zip_url_locations()
    it = generate_primes()
    assert [next(it) for _ in range(4)] == [2, 3, 5, 7]
    assert callable(install_atlas_from_zipfile)
    assert callable(install_hybrid_cardiac_from_zip)
    assert callable(download_and_install_nnunet_task)
    assert callable(install_nnunet_model_from_zip)
    assert FileWriter.supported_formats == ["png"]

    img = from_array(np.random.rand(6, 12, 12).astype(np.float32))
    v = VisualiseImage(img, colormap="Greys_r")
    assert v.image is img
    proj = project_onto_arbitrary_plane(img, "max", 2, rotation_angle=0.1)
    assert proj.ndim == 2

    # atlas zip install round-trip
    import zipfile
    zp = tmp_path / "atlas.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("Case_01/Images/Case_01.nii.gz", b"x")
    dest = tmp_path / "installed" / "test_atlas"
    install_atlas_from_zipfile(zp, dest)
    assert (dest / "Case_01/Images/Case_01.nii.gz").exists()

    p = write_vtk_tube_to_file(
        np.array([[0.0, 0, 0], [5, 0, 0], [10, 2, 0]]), tmp_path / "t.vtk"
    )
    assert "POLYDATA" in open(p).read()
    p2 = convert_simpleitk_to_vtk(img, tmp_path / "i.vtk")
    assert "STRUCTURED_POINTS" in open(p2).read()
