"""REST API — stdlib HTTP server
(reference: platipy/backend/api.py:44-595, Flask-RESTful there).

Endpoints (same paths and payload shapes as the reference):
  GET  /api/status/<task_id>
  POST /api/trigger                 {dataset, config?}
  GET  /api/algorithm
  GET/POST /api/dataset[/<id>], GET /api/datasets
  GET  /api/dataset/ready/<id>
  GET/POST /api/dataobject[/<id>], GET /api/dataobjects
  GET  /api/dataobject/download/<id>
  GET/POST /api/dicomlocation

Auth: the ``API_KEY`` request header, checked against the api_key table
(reference api.py:44-57).
"""

from __future__ import annotations

import json
import logging
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

logger = logging.getLogger(__name__)

__all__ = ["serve", "make_server"]


def _json_bytes(payload) -> bytes:
    return json.dumps(payload, default=str).encode("utf-8")


class ApiHandler(BaseHTTPRequestHandler):
    app = None  # injected by make_server
    protocol_version = "HTTP/1.1"

    # -- plumbing ---------------------------------------------------------------
    def log_message(self, fmt, *args):
        logger.debug("%s - %s", self.address_string(), fmt % args)

    def _send(self, code, payload=None, raw=None, content_type="application/json",
              extra_headers=None):
        body = raw if raw is not None else _json_bytes(payload if payload is not None else {})
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra_headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _auth(self):
        key = self.headers.get("API_KEY") or self.headers.get("Api-Key")
        if key and self.app.database.check_api_key(key):
            return key
        self._send(401, {"error": "invalid or missing API_KEY header"})
        return None

    def _body_json(self):
        length = int(self.headers.get("Content-Length", 0) or 0)
        if length == 0:
            return {}
        data = self.rfile.read(length)
        ctype = self.headers.get("Content-Type", "")
        if "application/json" in ctype:
            return json.loads(data.decode("utf-8"))
        if "multipart/form-data" in ctype:
            return self._parse_multipart(data, ctype)
        try:
            return {
                k: v[0] for k, v in parse_qs(data.decode("utf-8")).items()
            }
        except Exception:
            return {"__raw__": data}

    def _parse_multipart(self, data: bytes, ctype: str):
        match = re.search(r"boundary=([^;]+)", ctype)
        if not match:
            return {}
        boundary = match.group(1).strip('"').encode()
        parts = data.split(b"--" + boundary)
        fields = {}
        for part in parts:
            if b"\r\n\r\n" not in part:
                continue
            header_blob, content = part.split(b"\r\n\r\n", 1)
            content = content.rstrip(b"\r\n-")
            headers = header_blob.decode("latin-1", errors="replace")
            name_m = re.search(r'name="([^"]+)"', headers)
            file_m = re.search(r'filename="([^"]*)"', headers)
            if not name_m:
                continue
            name = name_m.group(1)
            if file_m:
                fields[name] = {"filename": file_m.group(1), "content": content}
            else:
                fields[name] = content.decode("utf-8", errors="replace")
        return fields

    # -- routing ------------------------------------------------------------------
    def do_GET(self):
        path = urlparse(self.path).path.rstrip("/")
        if path in ("", "/"):
            from platipy_tpu.backend.views import render_status_page

            page = render_status_page(self.app).encode("utf-8")
            return self._send(200, raw=page, content_type="text/html")

        key = self._auth()
        if key is None:
            return

        m = re.fullmatch(r"/api/status/([0-9a-f]+)", path)
        if m:
            status = self.app.task_runner.status(m.group(1))
            if status is None:
                return self._send(404, {"error": "unknown task"})
            return self._send(200, status)

        if path == "/api/algorithm":
            return self._send(200, [
                {"name": a.name, "default_settings": a.default_settings}
                for a in self.app.algorithms.values()
            ])

        if path == "/api/datasets":
            return self._send(200, self.app.database.list_datasets(key))

        m = re.fullmatch(r"/api/dataset/ready/([0-9a-f]+)", path)
        if m:
            ds = self.app.database.get_dataset(m.group(1))
            if ds is None:
                return self._send(404, {"error": "unknown dataset"})
            ready = all(o["is_fetched"] for o in ds["input_data_objects"])
            return self._send(200, {"ready": ready})

        m = re.fullmatch(r"/api/dataset/([0-9a-f]+)", path)
        if m:
            ds = self.app.database.get_dataset(m.group(1))
            if ds is None:
                return self._send(404, {"error": "unknown dataset"})
            return self._send(200, ds)

        if path == "/api/dataobjects":
            qs = parse_qs(urlparse(self.path).query)
            dataset = qs.get("dataset", [None])[0]
            if dataset:
                return self._send(200, self.app.database.get_data_objects(dataset))
            return self._send(400, {"error": "dataset query parameter required"})

        m = re.fullmatch(r"/api/dataobject/download/([0-9a-f]+)", path)
        if m:
            obj = self.app.database.get_data_object(m.group(1))
            if obj is None or not obj["path"] or not Path(obj["path"]).exists():
                return self._send(404, {"error": "object or file not found"})
            content = Path(obj["path"]).read_bytes()
            return self._send(
                200, raw=content, content_type="application/octet-stream",
                extra_headers={
                    "Content-Disposition": f"attachment; filename={Path(obj['path']).name}"
                },
            )

        m = re.fullmatch(r"/api/dataobject/([0-9a-f]+)", path)
        if m:
            obj = self.app.database.get_data_object(m.group(1))
            if obj is None:
                return self._send(404, {"error": "unknown data object"})
            return self._send(200, obj)

        if path == "/api/dicomlocation":
            qs = parse_qs(urlparse(self.path).query)
            name = qs.get("name", [None])[0]
            if name:
                loc = self.app.database.get_dicom_location(key, name)
                return self._send(200 if loc else 404, loc or {"error": "not found"})
            return self._send(400, {"error": "name query parameter required"})

        return self._send(404, {"error": f"unknown endpoint {path}"})

    def do_POST(self):
        key = self._auth()
        if key is None:
            return
        path = urlparse(self.path).path.rstrip("/")
        body = self._body_json()

        if path == "/api/trigger":
            algorithm_name = body.get("algorithm")
            dataset_id = body.get("dataset")
            config = body.get("config")
            if isinstance(config, str):
                config = json.loads(config)
            algorithm = self.app.algorithms.get(algorithm_name)
            if algorithm is None and len(self.app.algorithms) == 1:
                algorithm = list(self.app.algorithms.values())[0]
            if algorithm is None:
                return self._send(404, {"error": f"unknown algorithm {algorithm_name}"})
            task_id = self.app.task_runner.submit_run(algorithm, dataset_id, config)
            return self._send(
                200, {"poll": f"/api/status/{task_id}", "task_id": task_id}
            )

        if path == "/api/dataset":
            ds = self.app.database.add_dataset(
                key,
                from_dicom_location_id=body.get("from_dicom_location"),
                to_dicom_location_id=body.get("to_dicom_location"),
                timeout=body.get("timeout"),
            )
            return self._send(200, ds)

        if path == "/api/dataobject":
            dataset_id = body.get("dataset")
            obj_type = body.get("type", "FILE")
            meta = body.get("meta_data")
            if isinstance(meta, str):
                meta = json.loads(meta)
            series_uid = body.get("seriesUID") or body.get("series_instance_uid")
            file_field = body.get("file_data")
            file_name = body.get("file_name")
            path_out = None
            fetched = False
            if isinstance(file_field, dict):
                data_dir = Path(self.app.data_directory) / (dataset_id or "uploads")
                data_dir.mkdir(parents=True, exist_ok=True)
                fname = file_name or file_field["filename"] or "upload.bin"
                path_out = str(data_dir / fname)
                Path(path_out).write_bytes(file_field["content"])
                fetched = True
            obj = self.app.database.add_data_object(
                dataset_id,
                is_input=not body.get("is_output", False),
                parent_id=body.get("parent"),
                obj_type=obj_type,
                path=path_out,
                series_instance_uid=series_uid,
                meta_data=meta,
                is_fetched=fetched,
            )
            return self._send(200, obj)

        if path == "/api/dicomlocation":
            loc = self.app.database.add_dicom_location(
                key, body.get("name"), body.get("host"),
                int(body.get("port", 104)), body.get("ae_title"),
            )
            return self._send(200, loc)

        return self._send(404, {"error": f"unknown endpoint {path}"})


def make_server(app, host="0.0.0.0", port=8000) -> ThreadingHTTPServer:
    handler = type("BoundApiHandler", (ApiHandler,), {"app": app})
    return ThreadingHTTPServer((host, port), handler)


def serve(app, host="0.0.0.0", port=8000):
    server = make_server(app, host, port)
    server.serve_forever()
