"""Pinnacle RT export service (reference: services/pinnacle/service.py:37-135).

The reference wraps pymedphys' PinnacleExport; here the Pinnacle tar archive
is parsed and exported natively (:mod:`platipy_tpu.dicom.io.pinnacle`) —
CT + RTSTRUCT, with plan/trial selection matching the reference's logic.
"""

import json
import logging
import os
import shutil
import tarfile
import tempfile

from platipy_tpu.backend.application import app

logger = logging.getLogger(__name__)

PINNACLE_EXPORT_SETTINGS_DEFAULTS = {
    "exportModalities": ["CT", "RTSTRUCT"],
    "exportSeriesUIDs": [],
}


@app.register("Pinnacle Export",
              default_settings=PINNACLE_EXPORT_SETTINGS_DEFAULTS)
def pinnacle_export_service(data_objects, working_dir, settings):
    """Export Pinnacle tar archives to DICOM (reference service.py:37-170)."""
    from platipy_tpu.dicom.io.dataset import Element, read_file, write_file
    from platipy_tpu.dicom.io.pinnacle import PinnacleExport

    logger.info("Running Pinnacle Export")
    logger.info("Using settings: %s", settings)

    return_objects = []
    for data_object in data_objects:
        path = data_object["path"]
        logger.info("Running on data object: %s", path)
        if not tarfile.is_tarfile(path):
            logger.error("Can only process TAR file. Skipping file: %s", path)
            continue

        archive_path = tempfile.mkdtemp()
        with tarfile.open(path) as tar:
            for member in tar.getmembers():
                if ":" not in member.name:
                    tar.extract(member, path=archive_path, filter="data")

        meta_data_in = data_object.get("meta_data", {}) or {}
        pat_path = meta_data_in.get("patient_path", "")
        pinn = PinnacleExport(os.path.join(archive_path, pat_path))

        if len(pinn.plans) == 0:
            logger.error("No Plans found for patient")
            continue

        # plan selection: named plan if requested, else the first
        # (reference service.py:76-89)
        export_plan = None
        for plan in pinn.plans:
            if ("plan_name" in meta_data_in
                    and plan.plan_info["PlanName"] == meta_data_in["plan_name"]):
                export_plan = plan
                break
            if export_plan is None:
                export_plan = plan

        for trial in export_plan.trials:
            if ("trial" in meta_data_in
                    and trial["Name"] == meta_data_in["trial"]):
                export_plan.active_trial = trial["Name"]

        output_dir = os.path.join(working_dir, str(data_object.get("id", "out")))
        if os.path.exists(output_dir):
            shutil.rmtree(output_dir)
        os.makedirs(output_dir)

        if "CT" in settings["exportModalities"]:
            logger.info("Exporting Primary CT")
            pinn.export_image(export_plan.primary_image, export_path=output_dir)

        if "RTSTRUCT" in settings["exportModalities"]:
            logger.info("Exporting RTSTRUCT")
            pinn.export_struct(export_plan, output_dir)

        for modality in ("RTPLAN", "RTDOSE"):
            if modality in settings["exportModalities"]:
                logger.warning(
                    "%s export is not supported by the native Pinnacle "
                    "exporter (the reference marks RTPLAN output unverified, "
                    "reference service.py:143-146)", modality,
                )

        for image in pinn.images:
            if image.image_info[0]["SeriesUID"] in settings["exportSeriesUIDs"]:
                pinn.export_image(image, export_path=output_dir)

        output_files = sorted(os.listdir(output_dir))
        for name in output_files:
            obj_path = os.path.join(output_dir, name)
            if name.startswith("R"):
                # stamp export provenance into SOPAuthorizationComment
                # (reference service.py:127-160)
                ds = read_file(obj_path)
                meta_data = {"service": {
                    "tool": "Pinnacle Export Tool",
                    "trial": export_plan.active_trial["Name"],
                    "plan_date": export_plan.active_trial.get(
                        "ObjectVersion", {}
                    ).get("WriteTimeStamp", ""),
                    "plan_locked": export_plan.plan_info.get("PlanIsLocked", 0),
                }}
                if "meta" in meta_data_in:
                    meta_data["meta"] = meta_data_in["meta"]
                ds[(0x0100, 0x0424)] = Element(b"LT", json.dumps(meta_data))
                write_file(obj_path, ds, ds[(0x0008, 0x0016)].value,
                           ds[(0x0008, 0x0018)].value)
            return_objects.append({
                "type": "DICOM", "path": obj_path,
                "parent_id": data_object.get("id"),
            })

        shutil.rmtree(archive_path)

    logger.info("Finished Pinnacle Export")
    return return_objects


if __name__ == "__main__":
    app.dicom_listener_port = 7777
    app.dicom_listener_aetitle = "PINNACLE_EXPORT_SERVICE"
    app.run(host="0.0.0.0", port=8001)
