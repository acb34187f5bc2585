"""Service application — algorithm registry + server assembly
(reference: platipy/backend/application.py:37-155, Flask there; rebuilt on the
standard library so the service runs dependency-free).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict

from platipy_tpu.backend.models import Database
from platipy_tpu.backend.tasks import TaskRunner

logger = logging.getLogger(__name__)

__all__ = ["Algorithm", "ServiceApp", "FlaskApp", "app"]


class Algorithm:
    """A registered segmentation algorithm (reference application.py:19-34)."""

    def __init__(self, name: str, function: Callable, default_settings=None):
        self.name = name
        self.function = function
        self.default_settings = default_settings

    def settings_to_json(self):
        import json

        return json.dumps(self.default_settings, indent=4, default=str)


class ServiceApp:
    """The service container: algorithm registry, database, task runner.

    ``@app.register("Name", default_settings=...)`` mirrors the reference's
    FlaskApp.register decorator (application.py:50-55).
    """

    def __init__(self, name="platipy_tpu", database_path=":memory:", max_workers=1):
        self.name = name
        self.database = Database(database_path)
        self.task_runner = TaskRunner(self.database, max_workers=max_workers)
        self.algorithms: Dict[str, Algorithm] = {}
        self.data_directory = "./data"
        self.dicom_listener_port = 7777
        self.dicom_listener_aetitle = "PLATIPYTPUSVC"

    def register(self, name: str, default_settings=None):
        def decorator(function):
            self.algorithms[name] = Algorithm(name, function, default_settings)
            return function

        return decorator

    def run(self, host="0.0.0.0", port=8000, certfile=None, keyfile=None):
        """Serve the REST API (blocking); HTTPS when certs are given."""
        from platipy_tpu.backend.api import serve

        logger.info("Serving %s on %s:%d", self.name, host, port)
        serve(self, host=host, port=port, certfile=certfile, keyfile=keyfile)

    def run_dicom_listener(self, listen_port=None, listen_ae_title=None):
        """Start the embedded DICOM listener (reference application.py:84-154)."""
        from platipy_tpu.dicom.communication.connector import DicomConnector

        connector = DicomConnector(
            port=listen_port or self.dicom_listener_port,
            ae_title=listen_ae_title or self.dicom_listener_aetitle,
            output_directory=self.data_directory,
        )

        def on_store(path, ds):
            # wire each received instance into waiting data objects by
            # SeriesInstanceUID (reference application.py:84-154)
            series = ds.get((0x0020, 0x000E))
            if series is None:
                return
            series_uid = series.value
            import os

            rows = self.database._conn.execute(
                "SELECT id FROM data_object WHERE series_instance_uid = ? "
                "AND is_fetched = 0",
                (series_uid,),
            ).fetchall()
            for row in rows:
                self.database.update_data_object(
                    row["id"], path=os.path.dirname(path), is_fetched=1
                )
                logger.info(
                    "Series %s fetched for data object %s", series_uid, row["id"]
                )

        connector.listen(on_store)


# module-level app, mirroring `from platipy.backend import app` usage
app = ServiceApp()

# drop-in alias for reference code importing FlaskApp
FlaskApp = ServiceApp
