"""REST API — stdlib HTTP server
(reference: platipy/backend/api.py:44-595, Flask-RESTful there).

The endpoint surface matches the reference: one ``Resource`` class per
endpoint, registered on the same paths (reference api.py:582-595):

  GET  /api/status/<task_id>                TaskStatus
  POST /api/trigger                         TriggerEndpoint
  GET  /api/algorithm                       AlgorithmEndpoint
  GET  /api/datasets                        DatasetsEndpoint
  GET/POST /api/dataset[/<id>]              DatasetEndpoint
  GET  /api/dataset/ready/<id>              DatasetReadyEndpoint
  GET  /api/dataobjects                     DataObjectsEndpoint
  GET/POST/DELETE /api/dataobject[/<id>]    DataObjectEndpoint
  GET  /api/dataobject/download/<id>        DataObjectDownloadEndpoint
  GET/POST /api/dicomlocation               DicomLocationEndpoint

Auth: the ``API_KEY`` request header, checked against the api_key table
(reference api.py:44-57).
"""

from __future__ import annotations

import inspect
import json
import logging
import re
from functools import wraps
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

logger = logging.getLogger(__name__)

__all__ = [
    "CustomConfig",
    "authenticate",
    "Resource",
    "TaskStatus",
    "TriggerEndpoint",
    "AlgorithmEndpoint",
    "DatasetsEndpoint",
    "DatasetEndpoint",
    "DatasetReadyEndpoint",
    "DataObjectsEndpoint",
    "DataObjectEndpoint",
    "DataObjectDownloadEndpoint",
    "DicomLocationEndpoint",
    "API_RESOURCES",
    "serve",
    "make_server",
]


def _json_bytes(payload) -> bytes:
    return json.dumps(payload, default=str).encode("utf-8")


class CustomConfig:
    """Per-request algorithm settings holder (reference api.py:40-42)."""

    def __init__(self, name=None, config=None):
        self.name = name
        self.config = config


def authenticate(func):
    """Gate a resource method on a valid API_KEY header (reference api.py:44-57).

    The wrapped method runs with ``self.api_key`` set; an invalid or missing
    key returns 401 without invoking the method.
    """

    @wraps(func)
    def wrapper(self, *args, **kwargs):
        key = self.handler.headers.get("API_KEY") or self.handler.headers.get("Api-Key")
        if not key or not self.app.database.check_api_key(key):
            return 401, {"error": "invalid or missing API_KEY header"}
        self.api_key = key
        return func(self, *args, **kwargs)

    return wrapper


class Resource:
    """Base endpoint: binds the service app + live request handler.

    Methods return ``(status_code, payload)`` or ``(status_code, payload,
    extra)`` where extra carries raw-content overrides.
    """

    def __init__(self, app, handler):
        self.app = app
        self.handler = handler
        self.api_key = None

    # -- request helpers ------------------------------------------------------
    @property
    def query(self):
        return parse_qs(urlparse(self.handler.path).query)

    def query_one(self, name, default=None):
        return self.query.get(name, [default])[0]

    def body(self):
        return self.handler.body_json()


class TaskStatus(Resource):
    """GET /api/status/<task_id> (reference api.py:63-100)."""

    @authenticate
    def get(self, task_id):
        status = self.app.task_runner.status(task_id)
        if status is None:
            return 404, {"error": "unknown task"}
        return 200, status


class AlgorithmEndpoint(Resource):
    """GET /api/algorithm (reference api.py:508-515)."""

    @authenticate
    def get(self):
        return 200, [
            {"name": a.name, "default_settings": a.default_settings}
            for a in self.app.algorithms.values()
        ]


class TriggerEndpoint(Resource):
    """POST /api/trigger {algorithm, dataset, config?} (reference api.py:517-580)."""

    @authenticate
    def post(self):
        body = self.body()
        algorithm_name = body.get("algorithm")
        dataset_id = body.get("dataset")
        config = body.get("config")
        if isinstance(config, str):
            config = json.loads(config)
        algorithm = self.app.algorithms.get(algorithm_name)
        if algorithm is None and len(self.app.algorithms) == 1:
            algorithm = list(self.app.algorithms.values())[0]
        if algorithm is None:
            return 404, {"error": f"unknown algorithm {algorithm_name}"}
        task_id = self.app.task_runner.submit_run(algorithm, dataset_id, config)
        return 200, {"poll": f"/api/status/{task_id}", "task_id": task_id}


class DatasetsEndpoint(Resource):
    """GET /api/datasets (reference api.py:419-427)."""

    @authenticate
    def get(self):
        return 200, self.app.database.list_datasets(self.api_key)


class DatasetEndpoint(Resource):
    """GET /api/dataset/<id>, POST /api/dataset (reference api.py:429-483)."""

    @authenticate
    def get(self, dataset_id):
        ds = self.app.database.get_dataset(dataset_id)
        if ds is None:
            return 404, {"error": "unknown dataset"}
        return 200, ds

    @authenticate
    def post(self):
        body = self.body()
        ds = self.app.database.add_dataset(
            self.api_key,
            from_dicom_location_id=body.get("from_dicom_location"),
            to_dicom_location_id=body.get("to_dicom_location"),
            timeout=body.get("timeout"),
        )
        return 200, ds


class DatasetReadyEndpoint(Resource):
    """GET /api/dataset/ready/<id> (reference api.py:485-506)."""

    @authenticate
    def get(self, dataset_id):
        ds = self.app.database.get_dataset(dataset_id)
        if ds is None:
            return 404, {"error": "unknown dataset"}
        ready = all(o["is_fetched"] for o in ds["input_data_objects"])
        return 200, {"ready": ready}


class DataObjectsEndpoint(Resource):
    """GET /api/dataobjects?dataset=<id> (reference api.py:154-162)."""

    @authenticate
    def get(self):
        dataset = self.query_one("dataset")
        if not dataset:
            return 400, {"error": "dataset query parameter required"}
        return 200, self.app.database.get_data_objects(dataset)


class DataObjectEndpoint(Resource):
    """GET/DELETE /api/dataobject/<id>, POST /api/dataobject
    (reference api.py:164-388)."""

    @authenticate
    def get(self, dataobject_id):
        obj = self.app.database.get_data_object(dataobject_id)
        if obj is None:
            return 404, {"error": "unknown data object"}
        return 200, obj

    @authenticate
    def post(self):
        body = self.body()
        dataset_id = body.get("dataset")
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
            # client-controlled name: keep only the basename so '../' (or an
            # absolute path) cannot escape the data directory
            fname = Path(fname).name or "upload.bin"
            path_out = str(data_dir / fname)
            Path(path_out).write_bytes(file_field["content"])
            fetched = True
        obj = self.app.database.add_data_object(
            dataset_id,
            is_input=not body.get("is_output", False),
            parent_id=body.get("parent"),
            obj_type=body.get("type", "FILE"),
            path=path_out,
            series_instance_uid=series_uid,
            meta_data=meta,
            is_fetched=fetched,
        )
        return 200, obj

    @authenticate
    def delete(self, dataobject_id):
        obj = self.app.database.get_data_object(dataobject_id)
        if obj is None:
            return 404, {"error": "unknown data object"}
        self.app.database.delete_data_object(dataobject_id)
        return 200, {"deleted": dataobject_id}


class DataObjectDownloadEndpoint(Resource):
    """GET /api/dataobject/download/<id> (reference api.py:390-417)."""

    @authenticate
    def get(self, dataobject_id):
        obj = self.app.database.get_data_object(dataobject_id)
        if obj is None or not obj["path"] or not Path(obj["path"]).exists():
            return 404, {"error": "object or file not found"}
        content = Path(obj["path"]).read_bytes()
        return 200, None, {
            "raw": content,
            "content_type": "application/octet-stream",
            "headers": {
                "Content-Disposition":
                    f"attachment; filename={Path(obj['path']).name}"
            },
        }


class DicomLocationEndpoint(Resource):
    """GET/POST /api/dicomlocation (reference api.py:101-152)."""

    @authenticate
    def get(self):
        name = self.query_one("name")
        if not name:
            return 400, {"error": "name query parameter required"}
        loc = self.app.database.get_dicom_location(self.api_key, name)
        if loc is None:
            return 404, {"error": "not found"}
        return 200, loc

    @authenticate
    def post(self):
        body = self.body()
        loc = self.app.database.add_dicom_location(
            self.api_key, body.get("name"), body.get("host"),
            int(body.get("port", 104)), body.get("ae_title"),
        )
        return 200, loc


# route table mirroring the reference's api.add_resource calls (api.py:582-595);
# order matters: more specific paths first
API_RESOURCES = [
    (r"/api/status/(?P<task_id>[0-9a-f]+)", TaskStatus),
    (r"/api/trigger", TriggerEndpoint),
    (r"/api/algorithm", AlgorithmEndpoint),
    (r"/api/datasets", DatasetsEndpoint),
    (r"/api/dataset/ready/(?P<dataset_id>[0-9a-f]+)", DatasetReadyEndpoint),
    (r"/api/dataset/(?P<dataset_id>[0-9a-f]+)", DatasetEndpoint),
    (r"/api/dataset", DatasetEndpoint),
    (r"/api/dataobjects", DataObjectsEndpoint),
    (r"/api/dataobject/download/(?P<dataobject_id>[0-9a-f]+)",
     DataObjectDownloadEndpoint),
    (r"/api/dataobject/(?P<dataobject_id>[0-9a-f]+)", DataObjectEndpoint),
    (r"/api/dataobject", DataObjectEndpoint),
    (r"/api/dicomlocation", DicomLocationEndpoint),
]


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

    def body_json(self):
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
            # part content is followed by exactly CRLF before the next
            # boundary delimiter; rstrip of a byte CLASS would also delete
            # genuine trailing '-'/CR/LF payload bytes (e.g. a DICOM file
            # ending in 0x0A)
            if content.endswith(b"\r\n"):
                content = content[:-2]
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
    def _dispatch(self, method):
        path = urlparse(self.path).path.rstrip("/")
        if method == "get":
            page = self._dashboard_route(path)
            if page is not None:
                return page
        return self._dispatch_api(method, path)

    def _dashboard_route(self, path):
        """Dashboard pages + static assets (reference backend/views.py:26-112
        renders Flask templates; same URLs here).  Returns None when the path
        is not a dashboard route (falls through to the JSON API)."""
        from platipy_tpu.backend import views as _views

        def html_page(text):
            return self._send(200, raw=text.encode("utf-8"),
                              content_type="text/html")

        if path in ("", "/"):
            return html_page(_views.render_status_page(self.app))
        if path == "/logs":
            return html_page(_views.render_log_page(self.app))
        if path == "/endpoint/add":
            return html_page(_views.render_endpoint_add_page(self.app))
        if path.startswith("/endpoint/"):
            from urllib.parse import unquote

            return html_page(
                _views.render_endpoint_page(
                    self.app, unquote(path[len("/endpoint/"):])
                )
            )
        if path == "/dashboard/status":
            return self._send(200, {"tasks": _views.task_rows(self.app)})
        if path == "/dashboard/log":
            return self._send(200, _views.fetch_log())
        if path.startswith("/static/"):
            resolved = _views.static_file(path[len("/static/"):])
            if resolved is None:
                return self._send(404, {"error": "not found"})
            blob, ctype = resolved
            return self._send(200, raw=blob, content_type=ctype)
        return None

    def _dispatch_api(self, method, path):
        for pattern, resource_cls in API_RESOURCES:
            m = re.fullmatch(pattern, path)
            if not m:
                continue
            handler_fn = getattr(resource_cls, method, None)
            if handler_fn is None:
                continue
            resource = resource_cls(self.app, self)
            # Check the path/handler arity up front so a TypeError raised
            # INSIDE the handler body is still reported as a server error
            # (500) rather than masked as a bad request.
            try:
                inspect.signature(handler_fn).bind(resource, **m.groupdict())
            except TypeError as err:
                return self._send(400, {"error": f"bad request: {err}"})
            try:
                result = handler_fn(resource, **m.groupdict())
            except json.JSONDecodeError as err:
                return self._send(400, {"error": f"invalid JSON body: {err}"})
            except Exception as err:
                logger.exception("Unhandled error serving %s %s", method, path)
                return self._send(500, {"error": str(err)})
            if len(result) == 2:
                code, payload = result
                return self._send(code, payload)
            code, payload, extra = result
            return self._send(
                code, payload, raw=extra.get("raw"),
                content_type=extra.get("content_type", "application/json"),
                extra_headers=extra.get("headers"),
            )
        return self._send(404, {"error": f"unknown endpoint {path}"})

    def do_GET(self):
        self._dispatch("get")

    def do_POST(self):
        self._dispatch("post")

    def do_DELETE(self):
        self._dispatch("delete")


def make_server(app, host="0.0.0.0", port=8000, certfile=None,
                keyfile=None) -> ThreadingHTTPServer:
    """Build the REST server; with ``certfile``/``keyfile`` it serves HTTPS
    (the reference hands certs to gunicorn, entrypoint.sh:14-22)."""
    handler = type("BoundApiHandler", (ApiHandler,), {"app": app})
    server = ThreadingHTTPServer((host, port), handler)
    if certfile:
        import ssl

        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(certfile=certfile, keyfile=keyfile)
        server.socket = ctx.wrap_socket(server.socket, server_side=True)
    return server


def serve(app, host="0.0.0.0", port=8000, certfile=None, keyfile=None):
    server = make_server(app, host, port, certfile=certfile, keyfile=keyfile)
    server.serve_forever()
