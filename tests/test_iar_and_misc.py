"""IAR, surface projection, and probability-threshold optimisation tests
(reference label/iar.py:36-301, label/projection.py, utils/math.py:57-179 —
none of which the reference's own suite covers)."""

from pathlib import Path

import numpy as np
import pytest

from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere


def _sphere_mask(radius, centre, shape=(24, 48, 48), spacing=(2.0, 2.0, 2.0)):
    arr = insert_sphere(np.zeros(shape), radius, centre)
    return from_array(arr.astype(np.uint8), spacing=spacing)


@pytest.fixture(scope="module")
def atlas_set_with_outlier():
    """7 concordant sphere atlases + 1 gross outlier (shifted + shrunk)."""
    rng = np.random.RandomState(0)
    atlas_set = {}

    def entry(mask):
        # the cardiac pipeline populates a per-atlas weight map before IAR
        ones = mask.with_array(np.ones(mask.spatial_shape, np.float32))
        return {"DIR": {"WHOLEHEART": mask, "Weight Map": ones}}

    for i in range(7):
        jit = rng.randint(-1, 2, size=3)
        mask = _sphere_mask(8 + rng.randint(-1, 2),
                           (12 + jit[0], 24 + jit[1], 24 + jit[2]))
        atlas_set[f"{i:02d}"] = entry(mask)
    atlas_set["99"] = entry(_sphere_mask(4, (6, 10, 38)))
    return atlas_set


def test_run_iar_removes_outlier(atlas_set_with_outlier):
    from platipy_tpu.label.iar import run_iar

    result = run_iar(
        dict(atlas_set_with_outlier), "WHOLEHEART",
        min_best_atlases=4, label="DIR",
    )
    assert "99" not in result, sorted(result)
    assert len(result) >= 4
    # concordant atlases survive
    assert set(result) <= {f"{i:02d}" for i in range(7)}


def test_run_iar_sphere_projection_path(atlas_set_with_outlier):
    """The project_on_sphere branch (regrid on a theta/phi grid) runs on
    non-unit spacing — its COM derivation crashed with NaNs before."""
    from platipy_tpu.label.iar import run_iar

    result = run_iar(
        dict(atlas_set_with_outlier), "WHOLEHEART",
        min_best_atlases=4, label="DIR", project_on_sphere=True,
        single_step=True,
    )
    assert len(result) >= 4


def test_projection_surface_distance():
    from platipy_tpu.label.projection import (
        evaluate_distance_on_surface,
        evaluate_distance_to_reference,
        regrid_spherical_data,
    )

    ref = _sphere_mask(8, (12, 24, 24))
    # identical test volume: distances ~0; shifted: distances ~shift
    theta, phi, values = evaluate_distance_on_surface(ref, ref)
    assert values.mean() < 1.5
    shifted = _sphere_mask(8, (12, 24, 28))
    _, _, values_shift = evaluate_distance_on_surface(ref, shifted)
    assert values_shift.max() >= 6.0  # 4 voxels * 2 mm on the far side

    d = evaluate_distance_to_reference(ref, shifted, resample_factor=2)
    assert d.ndim == 1 and d.size > 0

    lat, lon, grid = regrid_spherical_data(theta, phi, values, resolution=10)
    assert grid.shape == lat.shape == lon.shape


def test_quick_optimise_probability_finds_threshold():
    """The shrinking sweep recovers the threshold that maximises DSC."""
    from platipy_tpu.label.comparison import compute_metric_dsc
    from platipy_tpu.utils.math import gen_primes, quick_optimise_probability

    it = gen_primes()
    assert [next(it) for _ in range(5)] == [2, 3, 5, 7, 11]

    truth = _sphere_mask(8, (12, 24, 24))
    # probability map: smooth radial falloff crossing 0.5 at the truth surface
    zz, yy, xx = np.mgrid[:24, :48, :48].astype(np.float32)
    d = np.sqrt(((zz - 12) ** 2 + (yy - 24) ** 2 + (xx - 24) ** 2)) * 2.0
    prob = 1.0 / (1.0 + np.exp((d - 16.0) / 2.0))
    prob_img = from_array(prob.astype(np.float32), spacing=(2.0, 2.0, 2.0))

    p_opt, m_opt = quick_optimise_probability(
        compute_metric_dsc, truth, prob_img, p_0=0.3, delta=0.3,
        mode="max", verbose=False,
    )
    assert 0.2 <= p_opt <= 0.8
    assert m_opt > 0.9


def test_tcia_fetch_data_offline(tmp_path, monkeypatch):
    """fetch_data drives the TCIA REST flow (reference tcia.py:39-120):
    exercised offline by monkeypatching the HTTP layer with canned responses
    and a zipped synthetic DICOM series."""
    import io
    import zipfile

    from platipy_tpu.dicom.download import tcia
    from platipy_tpu.dicom.io.series import write_dicom_series

    img = from_array(
        (np.random.RandomState(0).rand(3, 16, 16) * 200).astype(np.float32),
        spacing=(1.0, 1.0, 2.5),
    )
    series_dir = tmp_path / "src"
    paths = write_dicom_series(img, series_dir, patient_id="TCIA-PAT-1")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for p in paths:
            zf.write(p, Path(p).name)
    zip_bytes = buf.getvalue()

    def fake_get_json(endpoint, params):
        if endpoint == "getCollectionValues":
            return [{"Collection": "TEST-COLL"}]
        if endpoint == "getPatient":
            assert params["Collection"] == "TEST-COLL"
            return [{"PatientID": "TCIA-PAT-1"}]
        if endpoint == "getModalityValues":
            return [{"Modality": "CT"}]
        if endpoint == "getSeries":
            return [{"SeriesInstanceUID": "1.2.3.4", "Modality": "CT"}]
        raise AssertionError(endpoint)

    class FakeResponse:
        content = zip_bytes

        def raise_for_status(self):
            pass

    class FakeRequests:
        @staticmethod
        def get(url, params=None, timeout=None):
            assert "getImage" in url
            return FakeResponse()

    monkeypatch.setattr(tcia, "_get_json", fake_get_json)
    import sys

    monkeypatch.setitem(sys.modules, "requests", FakeRequests)

    assert tcia.get_collections() == ["TEST-COLL"]
    assert tcia.get_patients_in_collection("TEST-COLL") == ["TCIA-PAT-1"]
    assert tcia.get_modalities_in_collection("TEST-COLL") == {"CT"}

    result = tcia.fetch_data("TEST-COLL", number_of_patients=1,
                             modalities=["CT"], nifti=True,
                             output_directory=str(tmp_path / "out"))
    assert "TCIA-PAT-1" in result
    patient_dir = Path(result["TCIA-PAT-1"])
    assert list((patient_dir / "dicom" / "1.2.3.4").glob("*.dcm"))
    nifti_files = list((patient_dir / "nifti").rglob("*.nii.gz"))
    assert len(nifti_files) >= 1

    # cached second call skips the network entirely
    result2 = tcia.fetch_data("TEST-COLL", patient_ids=["TCIA-PAT-1"],
                              output_directory=str(tmp_path / "out"))
    assert result2 == result


def test_snap_roi_to_seen_bucket_reuses_and_registers():
    from platipy_tpu.utils.crop import (
        pad_roi_to_multiple,
        reset_roi_buckets,
        snap_roi_to_seen_bucket,
    )

    reset_roi_buckets()
    image_size = (160, 160, 96)

    # first case registers its bucket unchanged
    s1, i1 = pad_roi_to_multiple((117, 130, 70), (10, 12, 8), image_size, 32)
    s1b, i1b = snap_roi_to_seen_bucket(s1, i1, image_size)
    assert s1b == s1 and i1b == i1

    # a smaller box (one bucket step down on z) snaps to the seen bucket
    s2, i2 = pad_roi_to_multiple((117, 130, 60), (20, 15, 10), image_size, 32)
    s2b, i2b = snap_roi_to_seen_bucket(s2, i2, image_size)
    assert s2b == s1b
    # snapped box still contains the needed box and stays in bounds
    for ax in range(3):
        assert i2b[ax] <= i2[ax]
        assert i2b[ax] + s2b[ax] >= i2[ax] + s2[ax]
        assert i2b[ax] >= 0 and i2b[ax] + s2b[ax] <= image_size[ax]

    # a bigger box cannot reuse the smaller bucket: registers a new one
    s3, i3 = pad_roi_to_multiple((150, 150, 90), (2, 2, 2), image_size, 32)
    s3b, _ = snap_roi_to_seen_bucket(s3, i3, image_size)
    assert s3b == s3

    # overhead cap: a tiny box does NOT balloon to a huge seen bucket
    s4, i4 = pad_roi_to_multiple((30, 30, 30), (40, 40, 30), image_size, 32)
    s4b, _ = snap_roi_to_seen_bucket(s4, i4, image_size)
    assert s4b == s4
    reset_roi_buckets()


def test_jax_platforms_cpu_redirect_after_tunnel_seeded_import():
    """platipy_tpu honours a JAX_PLATFORMS=cpu redirect even when jax was
    imported under a profile that exported a tunnel platform (jax seeds its
    config from the env var at import time): redirecting TO the local cpu
    backend can never hang and is the documented escape hatch."""
    import os
    import subprocess
    import sys

    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'notaplatform'\n"
        "import jax\n"  # config seeded with the bogus tunnel-like platform
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import platipy_tpu\n"
        "assert jax.config.jax_platforms == 'cpu', jax.config.jax_platforms\n"
        "print('ok', len(jax.devices()))\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.startswith("ok")


def test_min_distance_to_point_sets_matches_bruteforce():
    """Oracle: the tiled device nearest-point query (IAR's surface sampling)
    equals an O(M*K) numpy brute force, including padding buckets, mixed set
    sizes and the empty-set convention."""
    import numpy as np

    from platipy_tpu.core.distance import min_distance_to_point_sets

    rng = np.random.RandomState(3)
    query = rng.rand(137, 3).astype(np.float32) * 200.0
    sets = [
        rng.rand(11, 3).astype(np.float32) * 200.0,
        rng.rand(503, 3).astype(np.float32) * 200.0,
        np.zeros((0, 3), np.float32),
    ]
    out = min_distance_to_point_sets(query, sets, m_chunk=64, k_tile=128)
    assert out.shape == (3, 137)
    for i, pts in enumerate(sets):
        if pts.shape[0] == 0:
            assert np.all(np.isinf(out[i]))
            continue
        d = np.sqrt(
            ((query[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        ).min(axis=1)
        np.testing.assert_allclose(out[i], d, rtol=1e-4, atol=1e-3)


def test_device_contours_packed_matches_host_oracles():
    """IAR's single-program threshold -> fill -> largest -> contour chain
    (label/iar.py::_contours_packed_jit) must reproduce the host oracles
    (fusion.fill_and_largest_component_np + iar._contour_np) bitwise,
    including hole-fill and island-drop cases."""
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    from platipy_tpu.label.fusion import fill_and_largest_component_np
    from platipy_tpu.label.iar import _contour_np, _contours_packed_jit

    rng = np.random.RandomState(5)
    cases = []
    for i in range(3):
        f = gaussian_filter(rng.rand(24, 36, 36).astype(np.float32), 4)
        cases.append((f > np.percentile(f, 82)).astype(np.float32))
    hole = np.zeros((24, 36, 36), np.float32)
    hole[6:18, 8:28, 8:28] = 1
    hole[10:13, 14:18, 14:18] = 0   # interior hole -> filled
    hole[1:3, 1:3, 1:3] = 1         # island -> dropped
    cases.append(hole)
    cases.append(np.zeros((24, 36, 36), np.float32))  # empty lane

    stack = jnp.asarray(np.stack(cases))
    bits = np.asarray(
        _contours_packed_jit(stack, jnp.full((len(cases),), 0.1, jnp.float32))
    )
    contours = np.unpackbits(bits, count=stack.size).reshape(stack.shape)
    for k, c in enumerate(cases):
        ref = _contour_np(fill_and_largest_component_np(
            (c >= (0.1 * c.max() if c.max() > 0 else 0.1)).astype(np.uint8)
        ) > 0)
        np.testing.assert_array_equal(contours[k].astype(bool), ref,
                                      err_msg=f"case {k}")


def test_fill_and_largest_device_matches_native():
    """Batched device fill+largest (core/components.py) vs the native host
    union-find path on multi-component masks with holes."""
    from scipy.ndimage import gaussian_filter

    from platipy_tpu.core.components import (
        fill_and_largest_component_stack_device,
    )
    from platipy_tpu.label.fusion import fill_and_largest_component_np

    rng = np.random.RandomState(11)
    cases = [
        (gaussian_filter(rng.rand(20, 30, 30).astype(np.float32), 3)
         > 0.52).astype(np.uint8)
        for _ in range(4)
    ]
    # thin snake: exercises many propagation rounds
    snake = np.zeros((20, 30, 30), np.uint8)
    for k in range(0, 30, 6):
        snake[10, 2:28, k] = 1
        snake[10, 27 if (k // 6) % 2 == 0 else 2, k:min(k + 6, 30)] = 1
    cases.append(snake)
    out = np.asarray(fill_and_largest_component_stack_device(np.stack(cases)))
    for k, m in enumerate(cases):
        np.testing.assert_array_equal(out[k], fill_and_largest_component_np(m),
                                      err_msg=f"case {k}")


def test_keep_largest_device_matches_host():
    """Device keep-largest (no fill) vs the host union-find path —
    interior holes must be PRESERVED (largest-only semantics)."""
    from platipy_tpu.core.components import (
        keep_largest_component_stack,
        keep_largest_component_stack_device,
    )

    m = np.zeros((16, 20, 20), np.uint8)
    m[4:12, 4:16, 4:16] = 1
    m[7:9, 8:10, 8:10] = 0   # interior hole: must survive
    m[1:3, 1:3, 1:3] = 1     # island: must drop
    stack = np.stack([m, np.zeros_like(m)])
    dev = np.asarray(keep_largest_component_stack_device(stack))
    host = np.asarray(keep_largest_component_stack(stack))
    np.testing.assert_array_equal(dev, host)
    assert dev[0][7, 8, 8] == 0  # hole preserved
