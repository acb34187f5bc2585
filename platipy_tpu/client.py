"""REST client SDK (reference: platipy/client.py:35-449)."""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = ["PlatiPyClient"]

API_DICOM_LOCATION = "{0}/api/dicomlocation"
API_DATASET = "{0}/api/dataset"
API_DATASET_READY = "{0}/api/dataset/ready"
API_DATA_OBJECT = "{0}/api/dataobject"
API_TRIGGER = "{0}/api/trigger"
API_ALGORITHM = "{0}/api/algorithm"
API_DOWNLOAD_OBJECT = "{0}/api/dataobject/download"


class PlatiPyClient:
    """Client for a platipy_tpu segmentation service."""

    def __init__(self, host, port, api_key, algorithm_name, verify=None,
                 timeout=None):
        """``timeout``: per-request (connect, read) timeout in seconds passed
        to every HTTP call; None keeps requests' no-timeout default (a hung
        server then blocks the caller — fleet dispatchers should set one)."""
        protocol = "http" if verify is None else "https"
        self.base_url = f"{protocol}://{host}:{port}"
        self.api_key = api_key
        self.algorithm_name = algorithm_name
        self.verify = verify
        self.timeout = timeout

    def _headers(self):
        return {"API_KEY": self.api_key}

    def _get(self, url, **kwargs):
        import requests

        kwargs.setdefault("timeout", self.timeout)
        res = requests.get(url, headers=self._headers(), verify=self.verify, **kwargs)
        res.raise_for_status()
        return res

    def _post(self, url, **kwargs):
        import requests

        kwargs.setdefault("timeout", self.timeout)
        res = requests.post(url, headers=self._headers(), verify=self.verify, **kwargs)
        res.raise_for_status()
        return res

    # -- algorithms ---------------------------------------------------------------
    def get_default_settings(self):
        res = self._get(API_ALGORITHM.format(self.base_url))
        for alg in res.json():
            if alg["name"] == self.algorithm_name:
                return alg["default_settings"]
        return None

    def list_algorithms(self):
        """All algorithms the server offers (name + default settings)."""
        return self._get(API_ALGORITHM.format(self.base_url)).json()

    # -- dicom locations ------------------------------------------------------------
    def get_dicom_location(self, name):
        res = self._get(API_DICOM_LOCATION.format(self.base_url), params={"name": name})
        return res.json()

    def add_dicom_location(self, name, host, port, ae_title=None):
        res = self._post(
            API_DICOM_LOCATION.format(self.base_url),
            json={"name": name, "host": host, "port": port, "ae_title": ae_title},
        )
        return res.json()

    # -- datasets -------------------------------------------------------------
    def add_dataset(self, from_dicom_location=None, to_dicom_location=None, timeout=None):
        payload = {}
        if from_dicom_location:
            payload["from_dicom_location"] = from_dicom_location.get("id")
        if to_dicom_location:
            payload["to_dicom_location"] = to_dicom_location.get("id")
        if timeout:
            payload["timeout"] = str(timeout)
        res = self._post(API_DATASET.format(self.base_url), json=payload)
        return res.json()

    def get_dataset(self, dataset):
        dataset_id = dataset["id"] if isinstance(dataset, dict) else dataset
        res = self._get(f"{API_DATASET.format(self.base_url)}/{dataset_id}")
        return res.json()

    def get_dataset_ready(self, dataset):
        dataset_id = dataset["id"] if isinstance(dataset, dict) else dataset
        res = self._get(f"{API_DATASET_READY.format(self.base_url)}/{dataset_id}")
        return res.json()["ready"]

    # -- data objects ------------------------------------------------------------
    def add_data_object(self, dataset, dicom_location=None, seriesUID=None,
                        file_path=None, meta_data=None, parent=None):
        import requests

        dataset_id = dataset["id"] if isinstance(dataset, dict) else dataset
        data = {"dataset": dataset_id}
        if seriesUID:
            data["seriesUID"] = seriesUID
            data["type"] = "DICOM"
        if meta_data:
            data["meta_data"] = json.dumps(meta_data)
        if parent:
            data["parent"] = parent["id"] if isinstance(parent, dict) else parent

        if file_path:
            data["file_name"] = Path(file_path).name
            with open(file_path, "rb") as f:
                res = requests.post(
                    API_DATA_OBJECT.format(self.base_url),
                    headers=self._headers(),
                    data=data,
                    files={"file_data": f},
                    verify=self.verify,
                    timeout=self.timeout,
                )
        else:
            res = self._post(API_DATA_OBJECT.format(self.base_url), json=data)
        res.raise_for_status()
        return res.json()

    # -- run ------------------------------------------------------------------
    def run_algorithm(self, dataset, config=None, poll_interval=1.0, timeout_s=3600):
        """Trigger the algorithm and poll until COMPLETE/FAILURE; yields states."""
        dataset_id = dataset["id"] if isinstance(dataset, dict) else dataset
        payload = {"dataset": dataset_id, "algorithm": self.algorithm_name}
        if config:
            payload["config"] = json.dumps(config)
        res = self._post(API_TRIGGER.format(self.base_url), json=payload)
        poll_url = self.base_url + res.json()["poll"]

        deadline = time.time() + timeout_s
        while time.time() < deadline:
            status = self._get(poll_url).json()
            yield status
            if status.get("state") in ("COMPLETE", "FAILURE"):
                return
            time.sleep(poll_interval)

    def download_output_objects(self, dataset, output_path="."):
        dataset = self.get_dataset(dataset)
        output_path = Path(output_path)
        output_path.mkdir(parents=True, exist_ok=True)
        downloaded = []
        for obj in dataset["output_data_objects"]:
            res = self._get(f"{API_DOWNLOAD_OBJECT.format(self.base_url)}/{obj['id']}")
            disp = res.headers.get("Content-Disposition", "")
            filename = disp.split("filename=")[-1] if "filename=" in disp else obj["id"]
            target = output_path / filename
            target.write_bytes(res.content)
            downloaded.append(str(target))
        return downloaded
