"""DICOM I/O tests: series roundtrip, RTSTRUCT roundtrip, crawler, CLI."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere


@pytest.fixture(scope="module")
def ct_image():
    arr = insert_sphere(np.zeros((12, 32, 32)), 6, (6, 16, 16)) * 1040 - 1000
    return from_array(arr.astype(np.float32), origin=(-50, -40, 10), spacing=(1.5, 1.5, 3.0))


def test_dicom_series_roundtrip(ct_image, tmp_path):
    from platipy_tpu.dicom.io.series import read_dicom_series, write_dicom_series

    paths = write_dicom_series(ct_image, tmp_path / "series", patient_id="TestPat")
    assert len(paths) == 12

    back = read_dicom_series(str(tmp_path / "series"))
    np.testing.assert_allclose(
        np.asarray(back.array), np.round(np.asarray(ct_image.array)), atol=0.5
    )
    np.testing.assert_allclose(back.origin, ct_image.origin, atol=1e-3)
    np.testing.assert_allclose(back.spacing, ct_image.spacing, atol=1e-3)


def test_rtstruct_roundtrip(ct_image, tmp_path):
    from platipy_tpu.dicom.io.nifti_to_rtstruct import convert_nifti
    from platipy_tpu.dicom.io.rtstruct_to_nifti import (
        read_dicom_struct_file,
        transform_point_set_from_dicom_struct,
    )
    from platipy_tpu.dicom.io.series import read_dicom_series, write_dicom_series
    from platipy_tpu.label.comparison import compute_metric_dsc

    write_dicom_series(ct_image, tmp_path / "series", patient_id="TestPat")

    mask_arr = (np.asarray(ct_image.array) > -500).astype(np.uint8)
    mask = ct_image.with_array(__import__("jax.numpy", fromlist=["asarray"]).asarray(mask_arr))

    rt_path = tmp_path / "rtstruct.dcm"
    convert_nifti(str(tmp_path / "series"), {"HEART": mask}, str(rt_path))
    assert rt_path.exists()

    image = read_dicom_series(str(tmp_path / "series"))
    struct = read_dicom_struct_file(str(rt_path))
    masks, names = transform_point_set_from_dicom_struct(image, struct)
    assert names == ["HEART"]
    dsc = compute_metric_dsc(mask, masks[0])
    assert dsc > 0.85, f"RTSTRUCT roundtrip DSC too low: {dsc}"


def test_crawler(ct_image, tmp_path):
    from platipy_tpu.dicom.io.crawl import process_dicom_directory
    from platipy_tpu.dicom.io.series import write_dicom_series

    write_dicom_series(ct_image, tmp_path / "dicom", patient_id="CrawlPat")
    out = process_dicom_directory(
        str(tmp_path / "dicom"), output_directory=str(tmp_path / "nifti")
    )
    assert "CrawlPat" in out
    written = out["CrawlPat"]["IMAGES"]
    assert len(written) == 1
    # reference layout: <out>/<parent>/IMAGES/<name>.nii.gz
    assert "CrawlPat/IMAGES" in str(written[0]).replace("\\", "/")
    from platipy_tpu.nifti.io import read_image

    img = read_image(written[0])
    assert img.spatial_shape == ct_image.spatial_shape


def test_crawler_options(ct_image, tmp_path):
    """Crawler option surface (reference crawl.py:836-1147): templated
    naming with arbitrary DICOM keywords, missing-keyword fallback to 0,
    custom suffix, overwrite gating, iterable input, write_to_disk=False."""
    from platipy_tpu.dicom.io.crawl import process_dicom_directory
    from platipy_tpu.dicom.io.series import write_dicom_series

    write_dicom_series(ct_image, tmp_path / "dicom", patient_id="OptPat")

    out = process_dicom_directory(
        [str(tmp_path / "dicom")],  # iterable-of-dirs input
        output_image_name_format="{parent_sorting_data}_{Modality}_{NoSuchKeyword}",
        output_directory=str(tmp_path / "a"),
        output_file_suffix=".nii",
    )
    paths = out["OptPat"]["IMAGES"]
    assert len(paths) == 1
    name = Path(paths[0]).name
    assert name == "OptPat_CT_0.nii"  # missing keyword -> 0, custom suffix

    # overwrite gating: second run with overwrite off leaves the file alone
    p = Path(paths[0])
    before = p.stat().st_mtime_ns
    process_dicom_directory(
        str(tmp_path / "dicom"),
        output_image_name_format="{parent_sorting_data}_{Modality}_{NoSuchKeyword}",
        output_directory=str(tmp_path / "a"),
        output_file_suffix=".nii",
        overwrite_existing_files=False,
    )
    assert p.stat().st_mtime_ns == before

    # write_to_disk=False returns the data dict with the converted image
    data = process_dicom_directory(
        str(tmp_path / "dicom"), write_to_disk=False,
        output_image_name_format="{parent_sorting_data}",
    )
    dd = data["OptPat"]
    assert dd["parent_sorting_data"] == "OptPat"
    img = dd["IMAGES"]["OptPat"]
    assert img.spatial_shape == ct_image.spatial_shape

    # sorting by an arbitrary keyword
    out2 = process_dicom_directory(
        str(tmp_path / "dicom"), parent_sorting_field="Modality",
        output_directory=str(tmp_path / "b"),
        output_image_name_format="{parent_sorting_data}",
    )
    assert list(out2.keys()) == ["CT"]


def test_crawl_helper_parity(ct_image, tmp_path):
    """Reference crawl helper symbols (crawl.py:33-393, 719-833): flatten,
    safe slice sort, file-list grouping, naming hints, nested output writer,
    contour repair."""
    import numpy as np

    from platipy_tpu.dicom.io.crawl import (
        fix_missing_data, flatten, get_dicom_info_from_description,
        process_dicom_file_list, safe_sort_dicom_image_list,
        write_output_data_to_disk,
    )
    from platipy_tpu.dicom.io.dataset import read_file
    from platipy_tpu.dicom.io.rtstruct_to_nifti import read_dicom_image
    from platipy_tpu.dicom.io.series import write_dicom_series

    assert list(flatten([1, [2, [3, "ab"]], 4])) == [1, 2, 3, "ab", 4]

    paths = write_dicom_series(ct_image, tmp_path / "series", patient_id="CrawlHelper")
    shuffled = [paths[5], paths[0], paths[11], paths[3]]
    ordered = safe_sort_dicom_image_list(shuffled)
    zs = [float(read_file(f)[(0x0020, 0x0032)].value[2]) for f in ordered]
    assert zs == sorted(zs)

    grouped = process_dicom_file_list(paths)
    assert len(grouped) == 1
    series = list(grouped.values())[0]
    assert len(series) == 1 and len(list(series.values())[0]) == 12

    ds = read_file(paths[0])
    assert get_dicom_info_from_description(ds) == ""  # CT: no extra info

    img = read_dicom_image(str(tmp_path / "series"))
    assert img.spatial_shape == (12, 32, 32)

    written = write_output_data_to_disk(
        {"parent_sorting_data": "CrawlHelper",
         "images": {"CT_0": img, "pair": [img, img]}},
        output_directory=str(tmp_path / "out"),
    )
    assert len(written["images"]) == 3
    for f in written["images"]:
        assert Path(f).exists()

    repaired = fix_missing_data([0.0, 0.0, 5.0, "", 2.0, 5.0, 4.0, 2.0, 5.0])
    assert repaired[3] == pytest.approx(2.0)  # mean of x-neighbours 0 and 4
    repaired_z = fix_missing_data([0.0, 0.0, "", 1.0, 0.0, 7.0])
    assert repaired_z[2] == pytest.approx(7.0)  # min of remaining z values


def test_rtdose_conversion(ct_image, tmp_path):
    """Write a synthetic RTDOSE file and convert it."""
    import numpy as np

    from platipy_tpu.dicom.io.dataset import Element, generate_uid, write_file
    from platipy_tpu.dicom.io.rtdose_to_nifti import convert_rtdose

    dose = (np.random.RandomState(0).rand(6, 16, 16) * 60).astype(np.float64)
    scaling = 0.001
    stored = np.round(dose / scaling).astype(np.uint32)

    sop_uid = generate_uid()
    ds = {
        (0x0008, 0x0016): Element(b"UI", "1.2.840.10008.5.1.4.1.1.481.2"),
        (0x0008, 0x0018): Element(b"UI", sop_uid),
        (0x0008, 0x0060): Element(b"CS", "RTDOSE"),
        (0x0020, 0x000D): Element(b"UI", generate_uid()),
        (0x0020, 0x000E): Element(b"UI", generate_uid()),
        (0x0020, 0x0032): Element(b"DS", [0.0, 0.0, 0.0]),
        (0x0020, 0x0037): Element(b"DS", [1, 0, 0, 0, 1, 0]),
        (0x0028, 0x0008): Element(b"IS", 6),
        (0x0028, 0x0010): Element(b"US", 16),
        (0x0028, 0x0011): Element(b"US", 16),
        (0x0028, 0x0030): Element(b"DS", [2.0, 2.0]),
        (0x0028, 0x0100): Element(b"US", 32),
        (0x0028, 0x0101): Element(b"US", 32),
        (0x0028, 0x0103): Element(b"US", 0),
        (0x3004, 0x000C): Element(b"DS", [0.0, 3.0, 6.0, 9.0, 12.0, 15.0]),
        (0x3004, 0x000E): Element(b"DS", scaling),
        (0x7FE0, 0x0010): Element(b"OW", stored.tobytes()),
    }
    path = tmp_path / "rtdose.dcm"
    write_file(str(path), ds, "1.2.840.10008.5.1.4.1.1.481.2", sop_uid)

    img = convert_rtdose(str(path))
    np.testing.assert_allclose(np.asarray(img.array), dose, atol=scaling)
    assert img.spacing == (2.0, 2.0, 3.0)


def test_cli_help_and_default():
    result = subprocess.run(
        [sys.executable, "-m", "platipy_tpu.cli.run"], capture_output=True, text=True
    )
    assert "PlatiPy-TPU CLI" in result.stdout
    assert "segmentation" in result.stdout

def test_dimse_networking_self_interop(tmp_path):
    """The from-scratch Upper Layer + DIMSE stack: our Storage SCP receives
    what our SCU sends (reference delegates this to pynetdicom,
    connector.py:43-394)."""
    import time

    from platipy_tpu.core.image import from_array
    from platipy_tpu.dicom.communication.connector import DicomConnector
    from platipy_tpu.dicom.io.dataset import read_file
    from platipy_tpu.dicom.io.nifti_to_series import convert_nifti_to_dicom_series

    img = from_array((np.random.RandomState(0).rand(3, 16, 16) * 500).astype(np.float32),
                     spacing=(1.0, 1.0, 2.0))
    series_dir = tmp_path / "series"
    series_dir.mkdir()
    convert_nifti_to_dicom_series(img, output_directory=str(series_dir))
    files = sorted(str(p) for p in series_dir.iterdir())

    conn = DicomConnector("127.0.0.1", 11997,
                          output_directory=str(tmp_path / "recv"))
    scp = conn.listen(block=False)
    time.sleep(0.2)
    try:
        assert conn.verify() is True
        assert conn.send_dcm(files) is True
        assert len(scp.received) == len(files)
        ds = read_file(scp.received[0])
        assert ds[(0x0028, 0x0010)].value == 16
    finally:
        scp.shutdown()


def test_dimse_verify_no_server():
    from platipy_tpu.dicom.communication.connector import DicomConnector

    conn = DicomConnector("127.0.0.1", 1)  # nothing listens there
    assert conn.verify() is False


def test_pt_suv_scaling(tmp_path):
    """PT series convert to body-weight SUV (reference crawl.py:44-85):
    factor = weight*1000 / (dose * 2^(-dt/half_life))."""
    from platipy_tpu.dicom.io.dataset import Element, read_file, write_file
    from platipy_tpu.dicom.io.series import (
        get_suv_bw_scale_factor, read_dicom_series, write_dicom_series,
    )

    img = from_array(
        np.full((4, 16, 16), 500.0, np.float32), spacing=(2.0, 2.0, 3.0)
    )
    paths = write_dicom_series(img, tmp_path / "pt", modality="PT")

    pt_tags = {
        (0x0054, 0x1001): Element(b"CS", "BQML"),
        (0x0008, 0x0021): Element(b"DA", "20260101"),
        (0x0008, 0x0031): Element(b"TM", "110000"),
        (0x0010, 0x1030): Element(b"DS", 70.0),
        (0x0054, 0x0016): Element(b"SQ", [{
            (0x0018, 0x1072): Element(b"TM", "100000"),
            (0x0018, 0x1074): Element(b"DS", 3.5e8),
            (0x0018, 0x1075): Element(b"DS", 6586.2),  # F-18
        }]),
    }
    for p in paths:
        ds = read_file(p)
        ds.update(pt_tags)
        write_file(p, ds, "1.2.840.10008.5.1.4.1.1.128",
                   str(ds[(0x0008, 0x0018)].value))

    ds = read_file(paths[0])
    factor = get_suv_bw_scale_factor(ds)
    expected = 70.0 * 1000 / (3.5e8 * 2 ** (-3600 / 6586.2))
    np.testing.assert_allclose(factor, expected, rtol=1e-6)

    suv_img = read_dicom_series([str(p) for p in paths], suv=True)
    np.testing.assert_allclose(
        np.asarray(suv_img.array), 500.0 * expected, rtol=1e-4
    )

    # the crawler routes PT through SUV scaling
    from platipy_tpu.dicom.io.crawl import process_dicom_series
    kind, data = process_dicom_series([str(p) for p in paths])
    assert kind == "image"
    np.testing.assert_allclose(
        np.asarray(data.array), 500.0 * expected, rtol=1e-4
    )


def test_rtdose_decreasing_offsets_and_nonzero_start(tmp_path):
    """GridFrameOffsetVector with a negative step (frames advance along
    -normal, legal DICOM) flips the slice axis, and a non-zero first offset
    shifts the origin — previously the cube was silently mirrored in z."""
    import numpy as np

    from platipy_tpu.dicom.io.dataset import Element, generate_uid, write_file
    from platipy_tpu.dicom.io.rtdose_to_nifti import convert_rtdose

    dose = np.zeros((4, 8, 8))
    dose[0] = 10.0  # frame 0 is hottest
    stored = np.round(dose / 0.01).astype(np.uint32)

    sop_uid = generate_uid()
    ds = {
        (0x0008, 0x0016): Element(b"UI", "1.2.840.10008.5.1.4.1.1.481.2"),
        (0x0008, 0x0018): Element(b"UI", sop_uid),
        (0x0008, 0x0060): Element(b"CS", "RTDOSE"),
        (0x0020, 0x000D): Element(b"UI", generate_uid()),
        (0x0020, 0x000E): Element(b"UI", generate_uid()),
        (0x0020, 0x0032): Element(b"DS", [0.0, 0.0, 50.0]),
        (0x0020, 0x0037): Element(b"DS", [1, 0, 0, 0, 1, 0]),
        (0x0028, 0x0008): Element(b"IS", 4),
        (0x0028, 0x0010): Element(b"US", 8),
        (0x0028, 0x0011): Element(b"US", 8),
        (0x0028, 0x0030): Element(b"DS", [2.0, 2.0]),
        (0x0028, 0x0100): Element(b"US", 32),
        (0x0028, 0x0101): Element(b"US", 32),
        (0x0028, 0x0103): Element(b"US", 0),
        (0x3004, 0x000C): Element(b"DS", [6.0, 3.0, 0.0, -3.0]),  # decreasing
        (0x3004, 0x000E): Element(b"DS", 0.01),
        (0x7FE0, 0x0010): Element(b"OW", stored.tobytes()),
    }
    path = tmp_path / "rtdose_rev.dcm"
    write_file(str(path), ds, "1.2.840.10008.5.1.4.1.1.481.2", sop_uid)

    img = convert_rtdose(str(path))
    # frame 0 sits at z = 50 + 6 = 56 mm; array index 0 maps there
    assert img.origin[2] == pytest.approx(56.0)
    assert img.direction[8] == pytest.approx(-1.0)  # slice axis flipped
    assert np.asarray(img.array)[0].max() == pytest.approx(10.0)
    # physical location of the hottest frame is unchanged by the convention
    p2i = np.asarray(img.physical_to_index_matrix())
    idx = p2i[:3, :3] @ np.array([0.0, 0.0, 56.0]) + p2i[:3, 3]
    assert idx[2] == pytest.approx(0.0, abs=1e-6)


def test_contour_missing_value_repair(ct_image, tmp_path):
    """A ContourData stream with one empty component survives decoding (empty
    values are preserved, not dropped) and is repaired by interpolation."""
    from platipy_tpu.dicom.io.dataset import Element
    from platipy_tpu.dicom.io.rtstruct_to_nifti import (
        transform_point_set_from_dicom_struct,
    )

    # square contour inside the image's physical extent (x in [-50,-3.5],
    # y in [-40,6.5], z in [10,43]); the missing y interpolates to -20
    raw = [-40.0, -30.0, 25.0, -20.0, "", 25.0,
           -20.0, -10.0, 25.0, -40.0, -10.0, 25.0]

    def seq(items):
        return Element(b"SQ", items)

    struct_ds = {
        (0x3006, 0x0020): seq([
            {(0x3006, 0x0022): Element(b"IS", 1),
             (0x3006, 0x0026): Element(b"LO", "REPAIR")},
        ]),
        (0x3006, 0x0039): seq([
            {(0x3006, 0x0084): Element(b"IS", 1),
             (0x3006, 0x0040): seq([
                 {(0x3006, 0x0050): Element(b"DS", raw)},
             ])},
        ]),
    }
    masks, names = transform_point_set_from_dicom_struct(ct_image, struct_ds)
    assert names == ["REPAIR"]
    assert np.asarray(masks[0].array).sum() > 0  # polygon rasterised


def test_multipart_trailing_payload_bytes_preserved(tmp_path):
    """An uploaded file ending in '-'/newline bytes survives the multipart
    parser byte-exact (rstrip of a byte class truncated such files)."""
    import threading

    import requests

    from platipy_tpu.backend.api import make_server
    from platipy_tpu.backend.application import ServiceApp

    app = ServiceApp(database_path=":memory:")
    app.data_directory = str(tmp_path / "data")
    key = app.database.add_api_key("t")
    server = make_server(app, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        payload = b"DICM-data-ending-badly-\r\n-"
        src = tmp_path / "tricky.bin"
        src.write_bytes(payload)
        with open(src, "rb") as f:
            res = requests.post(
                f"http://127.0.0.1:{port}/api/dataobject",
                headers={"API_KEY": key},
                data={"dataset": "up", "file_name": "tricky.bin"},
                files={"file_data": f},
            )
        res.raise_for_status()
        stored = Path(res.json()["path"]).read_bytes()
        assert stored == payload
        # path traversal is neutralised to a basename inside the data dir
        with open(src, "rb") as f:
            res2 = requests.post(
                f"http://127.0.0.1:{port}/api/dataobject",
                headers={"API_KEY": key},
                data={"dataset": "up", "file_name": "../../evil.bin"},
                files={"file_data": f},
            )
        stored_path = Path(res2.json()["path"]).resolve()
        assert stored_path.name == "evil.bin"
        assert str(tmp_path / "data") in str(stored_path)
        # arity mismatches answer with 400 instead of dropping the connection
        res3 = requests.get(f"http://127.0.0.1:{port}/api/dataset",
                            headers={"API_KEY": key})
        assert res3.status_code == 400
    finally:
        server.shutdown()


def test_ds_roundtrip_precision_and_empty_components(tmp_path):
    """DS re-encoding keeps up to 16 significant characters (was %g = 6) and
    empty components survive a read->write->read round trip."""
    from platipy_tpu.dicom.io.dataset import (
        Element, _ds_str, generate_uid, read_file, write_file,
    )

    assert _ds_str(-251.337890625) == "-251.337890625"
    assert len(_ds_str(-2.5133789062512345e2)) <= 16
    assert float(_ds_str(3.3112547e-05)) == 3.3112547e-05

    sop = generate_uid()
    ds = {
        (0x0008, 0x0016): Element(b"UI", "1.2.840.10008.5.1.4.1.1.2"),
        (0x0008, 0x0018): Element(b"UI", sop),
        (0x0020, 0x0032): Element(b"DS", [-251.337890625, 0.25, 1250.5]),
        (0x3006, 0x0050): Element(b"DS", [1.0, "", 3.0]),
    }
    path = tmp_path / "ds.dcm"
    write_file(str(path), ds, "1.2.840.10008.5.1.4.1.1.2", sop)
    back = read_file(str(path))
    assert back[(0x0020, 0x0032)].value[0] == -251.337890625
    assert back[(0x3006, 0x0050)].value == [1.0, "", 3.0]


def test_multiframe_single_file_series(tmp_path):
    """A single-file multi-frame series reads as a [frames, rows, cols]
    volume (np.stack previously produced a bogus 4-D array)."""
    from platipy_tpu.dicom.io.dataset import Element, generate_uid, write_file
    from platipy_tpu.dicom.io.series import read_dicom_series

    frames = (np.arange(4 * 8 * 8).reshape(4, 8, 8) % 500).astype(np.uint16)
    sop = generate_uid()
    ds = {
        (0x0008, 0x0016): Element(b"UI", "1.2.840.10008.5.1.4.1.1.128"),
        (0x0008, 0x0018): Element(b"UI", sop),
        (0x0008, 0x0060): Element(b"CS", "PT"),
        (0x0020, 0x000D): Element(b"UI", generate_uid()),
        (0x0020, 0x000E): Element(b"UI", generate_uid()),
        (0x0020, 0x0032): Element(b"DS", [0.0, 0.0, 0.0]),
        (0x0020, 0x0037): Element(b"DS", [1, 0, 0, 0, 1, 0]),
        (0x0018, 0x0088): Element(b"DS", 3.5),
        (0x0028, 0x0002): Element(b"US", 1),
        (0x0028, 0x0008): Element(b"IS", 4),
        (0x0028, 0x0010): Element(b"US", 8),
        (0x0028, 0x0011): Element(b"US", 8),
        (0x0028, 0x0030): Element(b"DS", [2.0, 2.0]),
        (0x0028, 0x0100): Element(b"US", 16),
        (0x0028, 0x0103): Element(b"US", 0),
        (0x7FE0, 0x0010): Element(b"OW", frames.tobytes()),
    }
    path = tmp_path / "mf.dcm"
    write_file(str(path), ds, "1.2.840.10008.5.1.4.1.1.128", sop)

    img = read_dicom_series([str(path)])
    assert img.spatial_shape == (4, 8, 8)
    assert img.spacing == (2.0, 2.0, 3.5)
    np.testing.assert_allclose(np.asarray(img.array), frames.astype(np.float32))


def test_nifti_nan_slope_ignored(tmp_path):
    """scl_slope=NaN means 'no scaling' — previously every voxel became NaN."""
    from platipy_tpu.nifti.io import read_image, write_image

    img = from_array(np.arange(4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4))
    path = tmp_path / "nan_slope.nii"
    write_image(img, str(path))
    raw = bytearray(path.read_bytes())
    import struct as _s

    raw[112:116] = _s.pack("<f", float("nan"))  # scl_slope
    path.write_bytes(bytes(raw))
    back = read_image(str(path))
    assert np.isfinite(np.asarray(back.array)).all()
    np.testing.assert_allclose(np.asarray(back.array), np.asarray(img.array))


def test_query_retrieve_find_get_move_roundtrip(tmp_path):
    """Full native Q/R flow: C-FIND locates the series, C-GET retrieves it
    with interleaved C-STORE sub-ops on the requesting association
    (reference connector.py:166-308), and C-MOVE ships it to a listener
    destination over a new association (reference connector.py:134-165)."""
    import time

    from platipy_tpu.core.image import from_array
    from platipy_tpu.dicom.communication.connector import DicomConnector
    from platipy_tpu.dicom.communication.upper_layer import QueryRetrieveSCP
    from platipy_tpu.dicom.io.dataset import Element, read_file
    from platipy_tpu.dicom.io.nifti_to_series import convert_nifti_to_dicom_series
    from platipy_tpu.dicom.io.series import read_dicom_series

    img = from_array(
        (np.random.RandomState(1).rand(3, 16, 16) * 500).astype(np.float32),
        spacing=(1.0, 1.0, 2.0),
    )
    pacs_dir = tmp_path / "pacs"
    pacs_dir.mkdir()
    convert_nifti_to_dicom_series(img, output_directory=str(pacs_dir))
    files = sorted(pacs_dir.iterdir())
    series_uid = read_file(str(files[0]))[(0x0020, 0x000E)].value

    qr_port, dest_port = 11998, 11999
    qr = QueryRetrieveSCP(
        "127.0.0.1", qr_port, serve_directory=str(pacs_dir),
        move_destinations={"DESTAE": ("127.0.0.1", dest_port)},
    )
    assert qr.reindex() == len(files)
    qr.start_background()
    time.sleep(0.2)

    conn = DicomConnector("127.0.0.1", qr_port,
                          output_directory=str(tmp_path / "got"))
    try:
        # C-FIND: one series-level match with the UID echoed back
        matches = conn.do_find({
            (0x0008, 0x0052): Element(b"CS", "SERIES"),
            (0x0020, 0x000E): Element(b"UI", series_uid),
        })
        assert len(matches) == 1
        assert matches[0][(0x0020, 0x000E)].value == series_uid

        # C-GET: files arrive on this association, no listener running
        got_dir = conn.download_series(series_uid)
        got = read_dicom_series(got_dir)
        np.testing.assert_allclose(
            np.asarray(got.array), np.asarray(img.array), atol=0.51
        )

        # C-MOVE: a destination listener receives the same series
        dest = DicomConnector("127.0.0.1", dest_port,
                              output_directory=str(tmp_path / "moved"))
        scp = dest.listen(block=False)
        time.sleep(0.2)
        try:
            counts = conn.move_series(series_uid, move_aet="DESTAE")
            assert counts["completed"] == len(files)
            assert counts["failed"] == 0
            assert len(scp.received) == len(files)
        finally:
            scp.shutdown()

        # unknown C-MOVE destination reports failure, not a hang
        counts = conn.move_series(series_uid, move_aet="NOSUCHAE")
        assert counts["completed"] == 0

        # registered but UNREACHABLE destination (listener shut down above):
        # the SCP must answer a failed C-MOVE-RSP with sub-op counts instead
        # of dropping the requester's association
        counts = conn.move_series(series_uid, move_aet="DESTAE")
        assert counts["completed"] == 0
        assert counts["failed"] == len(files)
    finally:
        qr.shutdown()


def _make_pinnacle_archive(root):
    """Synthetic Pinnacle patient directory: 8x32x32 CT with a bright cube,
    one plan with a square ROI outlining the cube on each slice it spans."""
    import numpy as np

    root.mkdir(parents=True, exist_ok=True)
    nz, ny, nx = 8, 32, 32
    dx = dy = 0.2   # cm
    dz = 0.3
    x0, y0, z0 = -3.1, -3.1, 10.0  # cm

    ct = np.full((nz, ny, nx), 1000, dtype=np.int16)  # water (HU 0)
    # cube: pinnacle x,y,z in [8,16) voxels on z slices 2..5
    ct[2:6, 8:16, 8:16] = 2000
    (root / "ImageSet_0.img").write_bytes(
        ct.astype(">i2").tobytes()
    )
    (root / "ImageSet_0.header").write_text("\n".join([
        f"x_dim = {nx};", f"y_dim = {ny};", f"z_dim = {nz};",
        f"x_pixdim = {dx};", f"y_pixdim = {dy};", f"z_pixdim = {dz};",
        f"x_start = {x0};", f"y_start = {y0};", f"z_start = {z0};",
        "datatype = 2;", "bitpix = 16;",
        "patient_position = HFS;",
        "series_UID = 1.2.826.0.1.3680043.9.9999.1;",
        "study_UID = 1.2.826.0.1.3680043.9.9999.2;",
    ]))
    (root / "Patient").write_text("""
PatientID = 4321;
FirstName = "Test";
LastName = "Pinnacle";
ImageSetList ={
  ImageSet ={
    ImageSetID = 0;
    ImageName = "ImageSet_0";
    SeriesUID = "1.2.826.0.1.3680043.9.9999.1";
  };
};
PlanList ={
  Plan ={
    PlanID = 0;
    PlanName = "PlanA";
    PrimaryCTImageSetID = 0;
  };
};
""")
    plan_dir = root / "Plan_0"
    plan_dir.mkdir()
    (plan_dir / "plan.Trial").write_text("""
TrialList ={
  Trial ={
    Name = "Trial_1";
    ObjectVersion ={
      WriteTimeStamp = "2020-01-01 00:00:00";
    };
  };
};
""")
    # square ROI outlining the cube: voxel centres 8..15 -> cm coords
    import io
    curves = []
    xs = [x0 + 8 * dx, x0 + 15 * dx]
    ys = [y0 + 8 * dy, y0 + 15 * dy]
    for k in range(2, 6):
        z = z0 + k * dz
        pts = [
            (xs[0], ys[0], z), (xs[1], ys[0], z),
            (xs[1], ys[1], z), (xs[0], ys[1], z),
        ]
        curves.append(pts)
    out = io.StringIO()
    out.write("roi={\n name:          CUBE\n volume_name:   ImageSet_0\n")
    out.write(f" num_curve =    {len(curves)};\n")
    for pts in curves:
        out.write(" curve={\n")
        out.write(f"  num_points =  {len(pts)};\n  points={{\n")
        for p in pts:
            out.write(f"   {p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
        out.write("  };\n };\n")
    out.write("};\n")
    (plan_dir / "plan.roi").write_text(out.getvalue())
    return root


def test_pinnacle_native_export(tmp_path):
    """Native Pinnacle archive parsing + CT/RTSTRUCT export
    (reference services/pinnacle/service.py:37-135 via pymedphys): exported
    CT pixels/geometry and the ROI contours stay registered in DICOM space."""
    from platipy_tpu.dicom.io.pinnacle import PinnacleExport
    from platipy_tpu.dicom.io.rtstruct_to_nifti import (
        read_dicom_struct_file,
        transform_point_set_from_dicom_struct,
    )
    from platipy_tpu.dicom.io.series import read_dicom_series

    pat_dir = _make_pinnacle_archive(tmp_path / "Institution_1" / "Patient_4321")
    pinn = PinnacleExport(pat_dir)
    assert pinn.patient_id == "4321"
    assert [p.plan_info["PlanName"] for p in pinn.plans] == ["PlanA"]
    assert pinn.plans[0].trials[0]["Name"] == "Trial_1"
    assert pinn.images[0].image_info[0]["SeriesUID"].endswith("9999.1")

    out_dir = tmp_path / "export"
    out_dir.mkdir()
    plan = pinn.plans[0]
    paths = pinn.export_image(plan.primary_image, out_dir)
    assert len(paths) == 8
    rs_path = pinn.export_struct(plan, out_dir)

    image = read_dicom_series(str(out_dir))
    arr = np.asarray(image.array)
    assert arr.shape == (8, 32, 32)
    # cube voxels are HU 1000, background HU 0
    assert int(round(float(arr.max()))) == 1000
    assert int(round(float(arr.min()))) == 0
    assert image.spacing == (2.0, 2.0, 3.0)

    # the RTSTRUCT mask must land exactly on the bright cube
    struct = read_dicom_struct_file(str(rs_path))
    masks, names = transform_point_set_from_dicom_struct(image, struct)
    assert names == ["CUBE"]
    mask = np.asarray(masks[0].array) > 0
    cube = arr > 500
    overlap = 2 * (mask & cube).sum() / (mask.sum() + cube.sum())
    assert overlap > 0.8, f"CT/RTSTRUCT registration broken: DSC={overlap}"

    # RTPLAN/RTDOSE stay explicitly unsupported
    with pytest.raises(NotImplementedError):
        pinn.export_plan(plan, out_dir)
