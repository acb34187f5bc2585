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

__all__ = ["TaskRunner"]


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
