"""End-to-end multi-atlas segmentation test on synthetic pseudo-CT spheres.

Mirrors the reference's synthetic-sphere strategy
(platipy/imaging/tests/test_cardiac.py:35-142): jittered atlas cases, shrunk
demons settings, DSC gate vs ground truth — plus an 8-virtual-device sharded
run exercising the atlas mesh.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from platipy_tpu.core.image import Image, from_array
from platipy_tpu.label.comparison import compute_metric_dsc
from platipy_tpu.projects.multiatlas.run import (
    MUTLIATLAS_SETTINGS_DEFAULTS,
    run_segmentation,
)


def _pseudo_ct(center, radius, shape=(24, 48, 48), spacing=(2.0, 2.0, 2.5)):
    """Sphere of soft tissue (+40 HU boundary-smoothed) in air, like the
    reference fixture (test_cardiac.py:35-71)."""
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float32)
    d = np.sqrt(
        ((xx - center[2]) * spacing[0]) ** 2
        + ((yy - center[1]) * spacing[1]) ** 2
        + ((zz - center[0]) * spacing[2]) ** 2
    )
    r_mm = radius * spacing[0]
    img = -1000 + 1040 / (1 + np.exp((d - r_mm) / 2.0))
    mask = (d <= r_mm).astype(np.uint8)
    return (
        from_array(img.astype(np.float32), spacing=spacing),
        from_array(mask, spacing=spacing),
    )


def _make_settings(n_atlases):
    rng = np.random.RandomState(42)
    atlas_set = {}
    for i in range(n_atlases):
        jitter = rng.randint(-2, 3, size=3)
        r_jit = 8 + rng.randint(-1, 2)
        img, mask = _pseudo_ct((12 + jitter[0], 24 + jitter[1], 24 + jitter[2]), r_jit)
        atlas_set[f"{i:02d}"] = {"CT Image": img, "WHOLEHEART": mask}

    settings = copy.deepcopy(MUTLIATLAS_SETTINGS_DEFAULTS)
    settings["atlas_settings"]["atlas_set"] = atlas_set
    settings["atlas_settings"]["atlas_id_list"] = list(atlas_set.keys())
    settings["atlas_settings"]["atlas_structure_list"] = ["WHOLEHEART"]
    settings["linear_registration_settings"]["shrink_factors"] = [4, 2]
    settings["linear_registration_settings"]["smooth_sigmas"] = [2, 0]
    settings["linear_registration_settings"]["number_of_iterations"] = 20
    settings["deformable_registration_settings"]["resolution_staging"] = [8, 4]
    settings["deformable_registration_settings"]["iteration_staging"] = [10, 10]
    settings["postprocessing_settings"]["structures_for_binaryfillhole"] = ["WHOLEHEART"]
    return settings


@pytest.mark.slow
def test_multiatlas_segmentation_synthetic():
    target_img, target_mask = _pseudo_ct((12, 24, 24), 8)
    settings = _make_settings(n_atlases=4)
    results, results_prob = run_segmentation(target_img, settings)

    assert "WHOLEHEART" in results
    auto = results["WHOLEHEART"]
    assert auto.spatial_shape == target_img.spatial_shape
    dsc = compute_metric_dsc(target_mask, auto)
    assert dsc > 0.9, f"multi-atlas DSC too low: {dsc}"

    prob = results_prob["WHOLEHEART"]
    assert float(np.asarray(prob.array).max()) <= 1.0 + 1e-5
    assert prob.array.dtype == jnp.float32


@pytest.mark.slow
def test_multiatlas_sharded_over_mesh(eight_cpu_devices):
    """8 atlases sharded over the 8 virtual devices (atlas mesh DP path)."""
    target_img, target_mask = _pseudo_ct((12, 24, 24), 8)
    settings = _make_settings(n_atlases=8)
    results, _ = run_segmentation(target_img, settings)
    dsc = compute_metric_dsc(target_mask, results["WHOLEHEART"])
    assert dsc > 0.9, f"sharded multi-atlas DSC too low: {dsc}"


@pytest.mark.slow
def test_multiatlas_sharded_pipeline_matches_unsharded(
    eight_cpu_devices, monkeypatch
):
    """run_segmentation's OWN shard branch (run.py:347-358): 10 atlases on 8
    devices — non-divisible, so pad_atlas_axis pads to 16 lanes and
    atlas_validity_mask must zero the 6 padded lanes out of the fusion.
    PLATIPY_TPU_SHARD_ON_CPU=1 forces the branch on the CPU backend
    (parallel/atlas.py sharding_enabled); outputs must match the unsharded
    run on the same inputs."""
    target_img, target_mask = _pseudo_ct((12, 24, 24), 8)
    settings = _make_settings(n_atlases=10)

    monkeypatch.delenv("PLATIPY_TPU_SHARD_ON_CPU", raising=False)
    results_ref, prob_ref = run_segmentation(
        target_img, copy.deepcopy(settings)
    )

    monkeypatch.setenv("PLATIPY_TPU_SHARD_ON_CPU", "1")
    results_sh, prob_sh = run_segmentation(target_img, copy.deepcopy(settings))

    dsc = compute_metric_dsc(target_mask, results_sh["WHOLEHEART"])
    assert dsc > 0.9, f"sharded pipeline DSC too low: {dsc}"

    p_ref = np.asarray(prob_ref["WHOLEHEART"].array)
    p_sh = np.asarray(prob_sh["WHOLEHEART"].array)
    # identical math up to cross-lane reduction order (16 lanes incl. 6
    # zero-weighted pads vs 10): probabilities agree to fp32 reduction noise
    np.testing.assert_allclose(p_sh, p_ref, atol=1e-4)

    b_ref = np.asarray(results_ref["WHOLEHEART"].array)
    b_sh = np.asarray(results_sh["WHOLEHEART"].array)
    n_diff = int((b_ref != b_sh).sum())
    assert n_diff == 0, f"{n_diff} binary voxels differ sharded vs unsharded"


def test_nifti_roundtrip(tmp_path):
    from platipy_tpu.nifti.io import read_image, write_image

    rng = np.random.RandomState(0)
    arr = (rng.rand(10, 12, 14) * 100).astype(np.float32)
    img = from_array(
        arr,
        origin=(-12.5, 3.0, 44.0),
        spacing=(0.9, 1.1, 2.5),
    )
    path = str(tmp_path / "test.nii.gz")
    write_image(img, path)
    back = read_image(path)
    np.testing.assert_allclose(np.asarray(back.array), arr, rtol=1e-6)
    np.testing.assert_allclose(back.origin, img.origin, atol=1e-4)
    np.testing.assert_allclose(back.spacing, img.spacing, atol=1e-5)
    np.testing.assert_allclose(back.direction, img.direction, atol=1e-5)

    # uint8 mask roundtrip
    mask = from_array((arr > 50).astype(np.uint8), spacing=(1, 1, 2))
    mpath = str(tmp_path / "mask.nii")
    write_image(mask, mpath)
    mback = read_image(mpath)
    assert np.asarray(mback.array).dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(mback.array), np.asarray(mask.array))

@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    """A re-run with the same checkpoint directory skips the registration
    stages and reproduces the same output (reference has no compute
    checkpointing at all — SURVEY §5.4)."""
    import copy
    import logging

    settings = _make_settings(3)
    img, mask = _pseudo_ct((12, 24, 24), 8)
    settings["checkpoint_directory"] = str(tmp_path / "ckpt")

    results1, _ = run_segmentation(img, settings)
    assert (tmp_path / "ckpt" / "cropbox.npz").exists()
    assert (tmp_path / "ckpt" / "rir.npz").exists()
    assert (tmp_path / "ckpt" / "dvf.npz").exists()

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Capture()
    logging.getLogger("platipy_tpu.projects.multiatlas.run").addHandler(handler)
    logging.getLogger("platipy_tpu.projects.multiatlas.run").setLevel(logging.INFO)
    try:
        results2, _ = run_segmentation(img, settings)
    finally:
        logging.getLogger("platipy_tpu.projects.multiatlas.run").removeHandler(handler)

    assert any("Resumed DVF stack" in m for m in records)
    a1 = np.asarray(results1["WHOLEHEART"].array)
    a2 = np.asarray(results2["WHOLEHEART"].array)
    assert np.array_equal(a1, a2)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["single_atlas", "crop_atlases", "local_vote"])
def test_pipeline_edge_paths(variant):
    """Edge configurations the reference supports: one atlas, atlas
    crop-to-structures (run.py:156-190), and locally-weighted voting
    (fusion.py:135-220)."""
    settings = _make_settings(1 if variant == "single_atlas" else 3)
    img, mask = _pseudo_ct((12, 24, 24), 8)
    settings["deformable_registration_settings"]["iteration_staging"] = [5, 5]
    if variant == "crop_atlases":
        settings["atlas_settings"]["crop_atlas_to_structures"] = True
        settings["atlas_settings"]["crop_atlas_expansion_mm"] = (10, 10, 10)
    if variant == "local_vote":
        settings["label_fusion_settings"]["vote_type"] = "local"
        settings["label_fusion_settings"]["vote_params"] = {"sigma": 2.0}
    results, _ = run_segmentation(img, settings)
    out = np.asarray(results["WHOLEHEART"].array)
    gt = np.asarray(mask.array)
    dsc = 2 * (out * gt).sum() / max(out.sum() + gt.sum(), 1)
    assert dsc > 0.8, (variant, dsc)


def test_pipeline_settings_plumb_demons_field_dtype(monkeypatch):
    """deformable_registration_settings["field_dtype"] reaches
    batched_multiscale_demons inside run_segmentation (bf16 field storage,
    an HBM-bandwidth lever — see registration/deformable._demons_level_impl)."""
    from platipy_tpu.projects.multiatlas import run as ma_run

    seen = {}
    real = ma_run.batched_multiscale_demons

    def spy(*args, **kwargs):
        seen["field_dtype"] = kwargs.get("field_dtype")
        return real(*args, **kwargs)

    monkeypatch.setattr(ma_run, "batched_multiscale_demons", spy)

    settings = _make_settings(2)
    settings["deformable_registration_settings"]["resolution_staging"] = [8]
    settings["deformable_registration_settings"]["iteration_staging"] = [3]
    settings["deformable_registration_settings"]["field_dtype"] = "bfloat16"
    target_img, _ = _pseudo_ct((12, 24, 24), 8)
    ma_run.run_segmentation(target_img, settings)
    assert seen.get("field_dtype") == "bfloat16"

def test_atlas_stage_strong_scaling_identical(eight_cpu_devices):
    """Strong-scaling smoke over the atlas mesh: the SAME 8-lane demons +
    warp + fusion stage under 1/2/4/8-device meshes.  Atlas lanes are
    chip-local through registration, so per-lane DVFs agree to f32 ulp
    across mesh sizes (the partitioner re-fuses per layout, so bit-exactness
    is NOT guaranteed — measured max delta ~1e-6 mm); the fused probability
    (a cross-lane reduction whose order the partitioner may reassociate)
    agrees to f32 noise.  This is the correctness leg of the scaling model
    in docs/parallelism.md."""
    from platipy_tpu.label.fusion import weighted_voting_batched
    from platipy_tpu.parallel.atlas import (
        atlas_mesh,
        batched_multiscale_demons,
        batched_warp_by_dvf,
        shard_over_atlases,
    )

    rng = np.random.RandomState(0)
    shape = (16, 24, 24)
    spacing = (2.0, 2.0, 2.5)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]].astype(np.float32)
    d = np.sqrt((xx - 12.0) ** 2 + (yy - 12.0) ** 2 + ((zz - 8.0) * 1.25) ** 2)
    fixed = jnp.asarray(-1000 + 1040 / (1 + np.exp((d - 8.0) / 1.5)))
    movings = []
    for _ in range(8):
        sh = rng.randint(-2, 3, 3)
        dj = np.sqrt((xx - 12.0 - sh[2]) ** 2 + (yy - 12.0 - sh[1]) ** 2
                     + ((zz - 8.0 - sh[0]) * 1.25) ** 2)
        movings.append(-1000 + 1040 / (1 + np.exp((dj - 8.0) / 1.5)))
    moving_stack = jnp.asarray(np.stack(movings))

    dvfs, fused = [], []
    for k in (1, 2, 4, 8):
        mv = shard_over_atlases(moving_stack, atlas_mesh(k))
        dvf = batched_multiscale_demons(
            fixed, mv, spacing_xyz=spacing,
            resolution_staging=[8, 4], iteration_staging=[4, 4],
            smoothing_sigmas=[0, 0],
        )
        warped = batched_warp_by_dvf(mv, dvf, spacing, default_value=-1000.0)
        prob = weighted_voting_batched(jnp.ones_like(warped), warped)
        dvfs.append(np.asarray(dvf))
        fused.append(np.asarray(prob))

    for k_idx in range(1, 4):
        np.testing.assert_allclose(dvfs[k_idx], dvfs[0], atol=1e-4)
        np.testing.assert_allclose(fused[k_idx], fused[0], atol=1e-3)
