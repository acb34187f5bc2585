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

def test_backend_reference_parity_surface(service, tmp_path):
    """Reference backend symbols exist and function: model record classes +
    AlchemyEncoder (models.py:30-170), task functions (tasks.py:43-263),
    view functions (views.py:26-112), manage helpers (manage.py:26-45),
    endpoint Resource classes on the reference's paths (api.py:582-595)."""
    import json

    from platipy_tpu.backend import api as api_mod
    from platipy_tpu.backend.manage import add_api_key, create_db
    from platipy_tpu.backend.models import (
        AlchemyEncoder, APIKey, DataObject, Dataset, DicomLocation,
        default_timeout,
    )
    from platipy_tpu.backend.tasks import (
        clean_up_task, move_task, retrieve_task, run_task,
    )
    from platipy_tpu.backend.views import (
        add_endpoint, dashboard, fetch_log, fetch_status, view_endpoint,
    )

    app, api_key, port = service

    # model records wrap row dicts and serialise via AlchemyEncoder
    ds_row = app.database.add_dataset(api_key)
    ds = Dataset(ds_row)
    assert ds.owner_key == api_key
    obj = DataObject(app.database.add_data_object(ds.id))
    assert obj.dataset_id == ds.id and obj.parent is None
    key_rec = APIKey(name="x", key="y")
    loc = DicomLocation(name="pacs", host="h", port=104)
    blob = json.loads(json.dumps(
        {"ds": ds, "obj": obj, "key": key_rec, "loc": loc,
         "timeout": default_timeout()},
        cls=AlchemyEncoder,
    ))
    assert blob["ds"]["id"] == ds.id and blob["loc"]["port"] == 104

    # endpoint classes cover the reference's route table
    names = {cls.__name__ for _, cls in api_mod.API_RESOURCES}
    assert {"TaskStatus", "TriggerEndpoint", "AlgorithmEndpoint",
            "DatasetsEndpoint", "DatasetEndpoint", "DatasetReadyEndpoint",
            "DataObjectsEndpoint", "DataObjectEndpoint",
            "DataObjectDownloadEndpoint", "DicomLocationEndpoint"} <= names
    assert callable(api_mod.authenticate) and api_mod.CustomConfig("n").name == "n"

    # synchronous run_task drives a registered algorithm to a terminal state
    status = run_task("Test Threshold", None, ds.id, app=app)
    assert status["state"] in ("COMPLETE", "FAILURE")

    # clean-up removes files of expired datasets
    victim = tmp_path / "expired.bin"
    victim.write_bytes(b"x")
    expired = app.database.add_dataset(api_key, timeout="2000-01-01T00:00:00")
    app.database.add_data_object(expired["id"], path=str(victim), is_fetched=True)
    assert clean_up_task(app) >= 1
    assert not victim.exists()

    # move/retrieve fail cleanly against an unreachable PACS
    result = move_task("ep", ["1.2.3"], "127.0.0.1", 1, "NOPE")
    assert "Unable to connect" in result["status"]
    bad_loc = app.database.add_dicom_location(api_key, "down", "127.0.0.1", 1)
    ds2 = app.database.add_dataset(api_key, from_dicom_location_id=bad_loc["id"])
    orphan = app.database.add_data_object(ds2["id"], series_instance_uid="1.2.3")
    assert retrieve_task(orphan["id"], app=app) is None

    # views
    ctx = fetch_status(app)
    assert ctx["worker"] and ctx["algorithms"]
    assert "log" in fetch_log(str(tmp_path / "missing.log"))
    assert "<html" in dashboard(app).lower()
    assert "Test Threshold" in add_endpoint(app)["algorithms"]
    assert view_endpoint(app, "Test Threshold")["name"] == "Test Threshold"

    # manage helpers
    db_path = tmp_path / "manage.db"
    create_db(str(db_path))
    new_key = add_api_key("ci", database=str(db_path))
    assert len(new_key) == 32

    # DELETE /api/dataobject/<id>
    import requests

    res = requests.delete(
        f"http://127.0.0.1:{port}/api/dataobject/{obj.id}",
        headers={"API_KEY": api_key},
    )
    assert res.status_code == 200
    assert app.database.get_data_object(obj.id) is None


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


def _spawn_service(tmp_path, fail=False):
    """Start an in-process service app on a free port; returns (app, key, port, server)."""
    import threading

    from platipy_tpu.backend.api import make_server
    from platipy_tpu.backend.application import ServiceApp

    app = ServiceApp(database_path=":memory:", max_workers=1)
    app.data_directory = str(tmp_path / "data")

    @app.register("Fleet Threshold", default_settings={"threshold": 0.5})
    def threshold_service(data_objects, working_dir, settings):
        import os

        if fail:
            raise RuntimeError("worker is broken")
        out = []
        for obj in data_objects:
            img = read_image(obj["path"])
            mask = img.with_array(
                (np.asarray(img.array) > settings["threshold"]).astype(np.uint8))
            out_path = os.path.join(working_dir, "Mask.nii.gz")
            write_image(mask, out_path)
            out.append({"path": out_path, "parent_id": obj["id"]})
        return out

    api_key = app.database.add_api_key("fleet")
    server = make_server(app, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return app, api_key, port, server


def test_cluster_worker_pool_dispatch_and_retry(tmp_path):
    """Multi-host DCN layer (SURVEY §2.10): the WorkerPool dispatches cases
    over a fleet via REST, load-balances through a shared queue, and retries
    cases from a failing host on a healthy one."""
    from platipy_tpu.parallel.cluster import CaseResult, Worker, WorkerPool

    good_app, good_key, good_port, s1 = _spawn_service(tmp_path / "good")
    bad_app, bad_key, bad_port, s2 = _spawn_service(tmp_path / "bad", fail=True)

    rng = np.random.RandomState(0)
    cases = []
    for i in range(4):
        img = from_array(rng.rand(4, 8, 8).astype(np.float32))
        path = tmp_path / f"case_{i}.nii.gz"
        write_image(img, str(path))
        cases.append(str(path))

    pool = WorkerPool(
        [Worker("127.0.0.1", good_port, good_key),
         Worker("127.0.0.1", bad_port, bad_key)],
        algorithm="Fleet Threshold", max_attempts=2, poll_interval=0.05,
    )
    assert len(pool.healthy_workers()) == 2  # both answer the REST ping

    results = pool.map(cases, working_dir=str(tmp_path / "out"))
    assert all(r.state == "COMPLETE" for r in results.values()), {
        c: (r.state, r.error) for c, r in results.items()}
    for r in results.values():
        assert len(r.outputs) == 1 and Path(r.outputs[0]).exists()
    # the failing host burned attempts but every case landed on the good one
    done_counts = {f"127.0.0.1:{good_port}": 0}
    for r in results.values():
        assert r.worker == f"127.0.0.1:{good_port}"
    assert pool.workers[0].cases_done == 4

    # a fleet with no healthy workers fails cleanly
    s1.shutdown()
    s2.shutdown()
    dead_pool = WorkerPool([Worker("127.0.0.1", 1, "nope")],
                           algorithm="Fleet Threshold", max_attempts=1)
    dead = dead_pool.map(cases[:1], working_dir=str(tmp_path / "out2"))
    assert list(dead.values())[0].state == "FAILURE"
    assert isinstance(list(dead.values())[0], CaseResult)


def test_all_service_shims_register(tmp_path):
    """Every deployed-service shim imports and registers its algorithm on the
    shared app (reference services/*/service.py); the dependency-gated ones
    (nnunet zoo, totalsegmentator, pinnacle) raise only when invoked."""
    import importlib
    import sys

    sys.path.insert(0, str(REPO_ROOT))
    names = ["bronchus", "cardiac", "dirqa", "mridixon", "nnunet",
             "pinnacle", "radiomics", "sample", "totalsegmentator"]
    for name in names:
        importlib.import_module(f"services.{name}.service")

    from platipy_tpu.backend.application import app as shared_app

    registered = set(shared_app.algorithms)
    assert {"Bronchus Segmentation", "Cardiac Segmentation",
            "Cardiac Structure Guided Segmentation",
            "Bone Segmentation (sample)", "Primitive Body Segmentation",
            "TotalSegmentator", "Pinnacle Export"} <= registered, registered

    # the sample services run end-to-end on a synthetic CT
    from services.sample.service import (
        bone_segmentation_service, primitive_body_segmentation,
        PRIMITIVE_SETTINGS_DEFAULTS, SAMPLE_SETTINGS_DEFAULTS,
    )

    rng = np.random.RandomState(0)
    ct = np.full((8, 16, 16), -1000.0, np.float32)
    ct[2:6, 4:12, 4:12] = 40.0      # body
    ct[3:5, 6:10, 6:10] = 700.0     # bone
    path = tmp_path / "ct.nii.gz"
    write_image(from_array(ct, spacing=(2, 2, 2)), str(path))
    objs = [{"id": "1", "path": str(path), "type": "FILE"}]

    out_bone = bone_segmentation_service(objs, str(tmp_path), SAMPLE_SETTINGS_DEFAULTS)
    bone = np.asarray(read_image(out_bone[0]["path"]).array)
    assert bone.sum() > 0 and bone[4, 8, 8] == 1 and bone[0, 0, 0] == 0

    settings = dict(PRIMITIVE_SETTINGS_DEFAULTS)
    settings["seed"] = [0, 0, 0]     # grow through the surrounding air
    out_body = primitive_body_segmentation(objs, str(tmp_path), settings)
    body = np.asarray(read_image(out_body[0]["path"]).array)
    # air region grown from the corner, then inverted = the body
    assert body[4, 8, 8] == 1 and body[0, 0, 0] == 0

    # the pinnacle service skips non-TAR inputs rather than raising
    # (reference services/pinnacle/service.py:52-55)
    from services.pinnacle.service import pinnacle_export_service

    out = pinnacle_export_service(
        objs, str(tmp_path), {"exportModalities": ["CT"], "exportSeriesUIDs": []}
    )
    assert out == []


def test_dashboard_pages_and_static(service):
    """Dashboard parity (reference backend/templates + backend/static,
    views.py:26-112): styled template pages, JSON polling endpoints, and
    static assets served with correct content types."""
    import json
    import urllib.request

    app, api_key, port = service
    base = f"http://127.0.0.1:{port}"

    def get(path):
        with urllib.request.urlopen(base + path) as r:
            return r.status, r.headers.get("Content-Type", ""), r.read()

    status, ctype, body = get("/")
    assert status == 200 and "text/html" in ctype
    page = body.decode()
    assert "Test Threshold" in page            # registered algorithm listed
    assert "/static/css/dashboard.css" in page  # styled via the template

    status, ctype, body = get("/logs")
    assert status == 200 and "text/html" in ctype

    status, ctype, body = get("/endpoint/Test Threshold".replace(" ", "%20"))
    assert status == 200 and b"threshold" in body

    status, ctype, body = get("/static/css/dashboard.css")
    assert status == 200 and "text/css" in ctype and b"--accent" in body
    status, ctype, body = get("/static/js/dashboard.js")
    assert status == 200 and b"pollTaskTable" in body

    # path traversal must not escape the static root
    import urllib.error

    try:
        status, _, _ = get("/static/../api.py")
        assert status == 404
    except urllib.error.HTTPError as err:
        assert err.code == 404

    status, _, body = get("/dashboard/status")
    assert status == 200
    assert "tasks" in json.loads(body)
    status, _, body = get("/dashboard/log")
    assert status == 200
    assert "log" in json.loads(body)
