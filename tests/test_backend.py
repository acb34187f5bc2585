"""Backend service E2E test: REST API + task runner + client SDK.

The reference's backend tests are disabled (SURVEY §4); here the full
client -> REST -> task -> algorithm -> download path is exercised against a
live in-process server.
"""

import os
import threading
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

import numpy as np
import pytest

from platipy_tpu.backend.application import ServiceApp
from platipy_tpu.backend.api import make_server
from platipy_tpu.client import PlatiPyClient
from platipy_tpu.core.image import from_array
from platipy_tpu.nifti.io import read_image, write_image


@pytest.fixture()
def service(tmp_path):
    app = ServiceApp(database_path=":memory:", max_workers=1)
    app.data_directory = str(tmp_path / "data")

    @app.register("Test Threshold", default_settings={"threshold": 0.5})
    def threshold_service(data_objects, working_dir, settings):
        import os

        out = []
        for obj in data_objects:
            img = read_image(obj["path"])
            mask = img.with_array((np.asarray(img.array) > settings["threshold"]).astype(np.uint8))
            out_path = os.path.join(working_dir, "Threshold.nii.gz")
            write_image(mask, out_path)
            out.append({"path": out_path, "parent_id": obj["id"]})
        return out

    api_key = app.database.add_api_key("test")
    server = make_server(app, host="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield app, api_key, port
    server.shutdown()


def test_backend_end_to_end(service, tmp_path):
    app, api_key, port = service
    client = PlatiPyClient("127.0.0.1", port, api_key, "Test Threshold")

    # algorithm discovery
    settings = client.get_default_settings()
    assert settings == {"threshold": 0.5}

    # dicom location management
    loc = client.add_dicom_location("TEST_PACS", "127.0.0.1", 11112, "TESTAE")
    assert client.get_dicom_location("TEST_PACS")["host"] == "127.0.0.1"

    # dataset + upload
    dataset = client.add_dataset()
    rng = np.random.RandomState(0)
    img = from_array(rng.rand(8, 16, 16).astype(np.float32), spacing=(1, 1, 2))
    in_path = tmp_path / "input.nii.gz"
    write_image(img, str(in_path))
    obj = client.add_data_object(dataset, file_path=str(in_path))
    assert obj["is_fetched"] == 1
    assert client.get_dataset_ready(dataset)

    # trigger + poll
    final_state = None
    for status in client.run_algorithm(dataset, config={"threshold": 0.25}):
        final_state = status["state"]
    assert final_state == "COMPLETE"

    # outputs registered + downloadable
    ds = client.get_dataset(dataset)
    assert len(ds["output_data_objects"]) == 1
    files = client.download_output_objects(dataset, output_path=str(tmp_path / "out"))
    assert len(files) == 1
    out_img = read_image(files[0])
    expected = (np.asarray(img.array) > 0.25).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(out_img.array), expected)


def test_backend_auth_rejected(service):
    app, api_key, port = service
    import requests

    res = requests.get(f"http://127.0.0.1:{port}/api/algorithm",
                       headers={"API_KEY": "wrong"})
    assert res.status_code == 401


def test_backend_failure_state(service, tmp_path):
    app, api_key, port = service

    @app.register("Always Fails", default_settings={})
    def failing_service(data_objects, working_dir, settings):
        raise RuntimeError("intentional failure")

    client = PlatiPyClient("127.0.0.1", port, api_key, "Always Fails")
    dataset = client.add_dataset()
    final = None
    for status in client.run_algorithm(dataset):
        final = status
    assert final["state"] == "FAILURE"
    assert "intentional failure" in final["error"]

def test_dirqa_service_qa_metrics(tmp_path):
    """DIR QA service end-to-end: demons DVF + jacobian/inverse-consistency
    stats (reference delegates to plastimatch SIFT, services/dirqa:65)."""
    import json
    import sys

    sys.path.insert(0, str(REPO_ROOT))
    from services.dirqa.service import DIRQA_SETTINGS_DEFAULTS, dirqa_service

    from platipy_tpu.core.image import from_array
    from platipy_tpu.nifti.io import write_image

    zz, yy, xx = np.mgrid[:16, :24, :24].astype(np.float32)

    def sph(c, r):
        d = np.sqrt((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
        return (1000 / (1 + np.exp((d - r) / 1.5)) - 500).astype(np.float32)

    write_image(from_array(sph((8, 12, 12), 6), spacing=(2.0, 2.0, 2.0)),
                str(tmp_path / "fixed.nii.gz"))
    write_image(from_array(sph((9, 13, 12), 5), spacing=(2.0, 2.0, 2.0)),
                str(tmp_path / "moving.nii.gz"))
    objs = [{"id": "1", "path": str(tmp_path / "fixed.nii.gz")},
            {"id": "2", "path": str(tmp_path / "moving.nii.gz")}]
    settings = dict(DIRQA_SETTINGS_DEFAULTS)
    settings["resolution_staging"] = [8]
    settings["iteration_staging"] = [10]
    out = dirqa_service(objs, str(tmp_path), settings)
    stats = json.load(open(out[1]["path"]))
    assert stats["jacobian_det_min"] > 0
    assert stats["folding_fraction"] == 0.0
    assert "inverse_consistency_mean_mm" in stats


def test_mri_dixon_fraction_maps(tmp_path):
    """Dixon service computes percentage fraction maps with divide-by-zero
    guarded to 0 (reference services/mridixon/service.py:75-84)."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    from services.mridixon.service import mri_dixon_analysis
    from platipy_tpu import from_array
    from platipy_tpu.nifti.io import read_image, write_image

    fat = np.zeros((4, 8, 8), np.float32); fat[1:3, 2:6, 2:6] = 30.0
    water = np.zeros((4, 8, 8), np.float32); water[1:3, 2:6, 2:6] = 70.0
    fp, wp = str(tmp_path / "f.nii.gz"), str(tmp_path / "w.nii.gz")
    write_image(from_array(fat), fp)
    write_image(from_array(water), wp)

    out = mri_dixon_analysis(
        [{"path": fp, "id": 1, "meta_data": {"image_type": "fat"}},
         {"path": wp, "id": 2, "meta_data": {"image_type": "water"}}],
        str(tmp_path), {},
    )
    ff = np.asarray(read_image(out[0]["path"]).array)
    wf = np.asarray(read_image(out[1]["path"]).array)
    assert ff[2, 3, 3] == 30.0 and wf[2, 3, 3] == 70.0
    assert ff[0, 0, 0] == 0.0 and wf[0, 0, 0] == 0.0  # guarded division
