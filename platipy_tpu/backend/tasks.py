"""Asynchronous task execution
(reference: platipy/backend/tasks.py:49-263, Celery there).

A thread-pool runner with the same task lifecycle (PENDING -> RUNNING ->
COMPLETE/FAILURE) and the same run_task semantics: load the dataset's input
objects, call the registered algorithm function with (input_objects,
working_dir, settings), persist the returned output file paths as output data
objects, optionally send to a DICOM location.
"""

from __future__ import annotations

import logging
import tempfile
import threading
import traceback
import uuid
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime
from typing import Dict, Optional

logger = logging.getLogger(__name__)

__all__ = [
    "TaskRunner",
    "run_task",
    "retrieve_task",
    "move_task",
    "clean_up_task",
    "run_dicom_listener",
]


def run_dicom_listener(app=None):
    """Start the service's embedded DICOM listener (reference tasks.py:43-45)."""
    if app is None:
        from platipy_tpu.backend.application import app as _app

        app = _app
    app.run_dicom_listener()


def clean_up_task(app=None):
    """Delete the files of data objects belonging to expired datasets
    (reference tasks.py:48-93).  Returns the number of objects removed."""
    import os
    import shutil

    if app is None:
        from platipy_tpu.backend.application import app as _app

        app = _app
    database = app.database
    removed = 0
    now = datetime.now()
    rows = database._conn.execute("SELECT id, timeout FROM dataset").fetchall()
    for row in rows:
        timeout = row["timeout"]
        if not timeout or datetime.fromisoformat(str(timeout)) >= now:
            continue
        for obj in database.get_data_objects(row["id"]):
            path = obj.get("path")
            if not path:
                continue
            try:
                if os.path.isdir(path):
                    shutil.rmtree(path)
                elif os.path.isfile(path):
                    os.remove(path)
                removed += 1
                database.update_data_object(obj["id"], path=None, is_fetched=0)
            except Exception:
                logger.warning("Could not remove data object %s", obj["id"])
    logger.info("Clean Up Task Complete: Removed %s DataObjects", removed)
    return removed


def retrieve_task(data_object_id, app=None):
    """C-GET a data object's series from its dataset's from-DICOM-location
    (reference tasks.py:96-124)."""
    from platipy_tpu.dicom.communication.connector import DicomConnector

    if app is None:
        from platipy_tpu.backend.application import app as _app

        app = _app
    database = app.database
    obj = database.get_data_object(data_object_id)
    dataset = database.get_dataset(obj["dataset_id"])
    location = database.get_dicom_location_by_id(dataset["from_dicom_location_id"])
    connector = DicomConnector(
        host=location["host"], port=location["port"], ae_title=location["ae_title"]
    )
    if not connector.verify():
        logger.error("Unable to connect to DICOM location: %s", location)
        return None
    dicom_path = connector.download_series(obj["series_instance_uid"])
    database.update_data_object(data_object_id, is_fetched=1, path=dicom_path)
    return dicom_path


def move_task(endpoint, seriesUIDs, host, port, ae_title, progress=None):
    """Trigger a DICOM C-MOVE for each series UID (reference tasks.py:127-173).

    ``progress`` is an optional callback(meta_dict) standing in for Celery's
    ``task.update_state``.
    """
    from platipy_tpu.dicom.communication.connector import DicomConnector

    notify = progress or (lambda meta: None)
    total = len(seriesUIDs)
    connector = DicomConnector(host=host, port=port, ae_title=ae_title)
    notify({"current": 0, "total": total, "status": "Verifying dicom location"})
    if not connector.verify():
        return {"current": 100, "total": 100,
                "status": "Unable to connect to dicom location"}
    for count, suid in enumerate(seriesUIDs):
        notify({"current": count, "total": total,
                "status": f"Moving series for UID: {suid}"})
        connector.move_series(suid)
    notify({"current": total, "total": total, "status": "Move Complete"})
    return {"current": total, "total": total, "status": "Move Complete"}


def run_task(algorithm_name, config, dataset_id, app=None):
    """Synchronous equivalent of the reference's Celery run_task
    (tasks.py:176-263): run the named algorithm on a dataset and block until
    the task reaches a terminal state; returns the final status dict."""
    import time

    if app is None:
        from platipy_tpu.backend.application import app as _app

        app = _app
    algorithm = app.algorithms[algorithm_name]
    task_id = app.task_runner.submit_run(algorithm, dataset_id, config)
    while True:
        status = app.task_runner.status(task_id)
        if status and status.get("state") in ("COMPLETE", "FAILURE"):
            return status
        time.sleep(0.2)


class TaskRunner:
    """Tracks and executes service tasks on a worker pool."""

    def __init__(self, database, max_workers: int = 1):
        self.database = database
        self.executor = ThreadPoolExecutor(max_workers=max_workers)
        self.tasks: Dict[str, Dict] = {}
        self._lock = threading.Lock()

    def status(self, task_id) -> Optional[Dict]:
        with self._lock:
            task = self.tasks.get(task_id)
            return dict(task) if task else None

    def _set_state(self, task_id, state, **info):
        with self._lock:
            task = self.tasks.setdefault(task_id, {})
            task["state"] = state
            task.update(info)

    def submit_run(self, algorithm, dataset_id, config=None) -> str:
        """Queue an algorithm run on a dataset (reference tasks.py:176-263)."""
        task_id = uuid.uuid4().hex
        self._set_state(task_id, "PENDING", dataset=dataset_id,
                        algorithm=algorithm.name)
        self.executor.submit(self._run_task, task_id, algorithm, dataset_id, config)
        return task_id

    def _run_task(self, task_id, algorithm, dataset_id, config):
        start = datetime.now()
        self._set_state(task_id, "RUNNING", current="Running Algorithm")
        try:
            dataset = self.database.get_dataset(dataset_id)
            input_objects = dataset["input_data_objects"]

            working_dir = tempfile.mkdtemp()
            settings = config if config is not None else algorithm.default_settings

            output_objects = algorithm.function(input_objects, working_dir, settings)

            for obj in output_objects or []:
                if isinstance(obj, dict):
                    path = obj.get("path")
                    parent = obj.get("parent_id")
                else:
                    path = str(obj)
                    parent = None
                self.database.add_data_object(
                    dataset_id, is_input=False, parent_id=parent, path=path,
                    is_fetched=True,
                )

            # optional DICOM send (reference tasks.py:220-245)
            ds = self.database.get_dataset(dataset_id)
            if ds.get("to_dicom_location_id"):
                loc = self.database.get_dicom_location_by_id(ds["to_dicom_location_id"])
                try:
                    from platipy_tpu.dicom.communication.connector import DicomConnector

                    connector = DicomConnector(
                        host=loc["host"], port=loc["port"], ae_title=loc["ae_title"]
                    )
                    for obj in ds["output_data_objects"]:
                        if obj["path"] and str(obj["path"]).endswith(".dcm"):
                            connector.send_dcm(obj["path"])
                            self.database.update_data_object(obj["id"], is_sent=True)
                except Exception as send_err:  # network optional
                    logger.warning("DICOM send failed: %s", send_err)

            elapsed = (datetime.now() - start).total_seconds()
            self._set_state(task_id, "COMPLETE", elapsed_s=elapsed)
        except Exception as err:
            logger.exception("Task %s failed", task_id)
            self._set_state(
                task_id, "FAILURE", error=str(err), traceback=traceback.format_exc()
            )
