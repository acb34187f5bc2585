"""End-to-end CLI drives through a subprocess (the reference's platipy_cli,
reference cli/run.py:32-71)."""

import json
import os
import subprocess
import sys

import numpy as np


def _run_cli(args, cwd=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # share the suite's persistent compile cache (tests/conftest.py): each
    # subprocess otherwise recompiles every program from scratch
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(__file__), ".jax_test_cache"
    )
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    return subprocess.run(
        [sys.executable, "-m", "platipy_tpu.cli.run", *args],
        # platipy_tpu/__init__ forces the JAX_PLATFORMS=cpu env through the
        # config API, so these run on the CPU backend (5-15 s observed);
        # round 1 saw ~500 s when the subprocess fell through to the device
        # tunnel
        capture_output=True, text=True, timeout=300, cwd=cwd, env=env,
    )


def test_cli_help_lists_tools():
    out = _run_cli([])
    assert "segmentation" in out.stdout
    assert "dicom_crawler" in out.stdout


def test_cli_segmentation_default_settings():
    out = _run_cli(["segmentation", "bronchus", "--default"])
    assert out.returncode == 0
    settings = json.loads(out.stdout[out.stdout.index("{"):])
    assert isinstance(settings, dict) and settings


def test_cli_nifti_to_series_and_back(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from platipy_tpu.core.image import from_array
    from platipy_tpu.nifti.io import write_image

    img = from_array((np.random.RandomState(0).rand(4, 16, 16) * 500).astype(np.float32),
                     spacing=(1.0, 1.0, 2.0))
    nii = tmp_path / "ct.nii.gz"
    write_image(img, str(nii))

    series_dir = tmp_path / "series"
    out = _run_cli(["nifti_to_series", "-i", str(nii), "-o", str(series_dir)])
    assert out.returncode == 0, out.stderr[-500:]
    files = sorted(series_dir.glob("*.dcm"))
    assert len(files) == 4

    nifti_out = tmp_path / "back"
    out = _run_cli(["dicom_crawler", "-i", str(series_dir), "-o", str(nifti_out)])
    assert out.returncode == 0, out.stderr[-500:]
    produced = list(nifti_out.rglob("*.nii.gz"))
    assert produced, "crawler produced no NIfTI"
