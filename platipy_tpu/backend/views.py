"""Web dashboard views (reference: platipy/backend/views.py:32-106).

A minimal HTML status page served by the stdlib API server: registered
algorithms, task states, system status (via psutil when available), and the
log tail.
"""

from __future__ import annotations

import logging
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = [
    "render_status_page",
    "render_log_page",
    "render_endpoint_page",
    "render_endpoint_add_page",
    "render_template",
    "static_file",
    "system_status",
    "log_tail",
    "dashboard",
    "fetch_status",
    "fetch_log",
    "view_endpoint",
    "add_endpoint",
]


def system_status() -> dict:
    """CPU/memory/disk summary (psutil-gated)."""
    try:
        import psutil

        return {
            "cpu_percent": psutil.cpu_percent(),
            "memory_percent": psutil.virtual_memory().percent,
            "disk_percent": psutil.disk_usage("/").percent,
        }
    except ImportError:
        import os

        load = os.getloadavg()
        return {"load_1m": load[0], "load_5m": load[1], "load_15m": load[2]}


def log_tail(log_file="service.log", lines: int = 100) -> str:
    path = Path(log_file)
    if not path.exists():
        return ""
    content = path.read_text(errors="replace").splitlines()
    return "\n".join(content[-lines:])


def dashboard(app=None) -> str:
    """Dashboard entry point — the status page HTML (reference views.py:108-112)."""
    if app is None:
        from platipy_tpu.backend.application import app as _app

        app = _app
    return render_status_page(app)


def fetch_status(app=None) -> dict:
    """Service status context: worker liveness, algorithms, DICOM listener,
    system usage, applications (reference views.py:70-106)."""
    if app is None:
        from platipy_tpu.backend.application import app as _app

        app = _app
    context = {
        # the reference checks Celery worker liveness; the thread-pool runner
        # is in-process, so it is alive whenever the app is
        "worker": app.task_runner is not None,
        "algorithms": [
            {"name": a.name, "default_settings": a.default_settings}
            for a in app.algorithms.values()
        ],
        "dicom_listener": {
            "port": app.dicom_listener_port,
            "aetitle": app.dicom_listener_aetitle,
        },
        "applications": [
            {"name": k.get("name"), "key": "XXX"}
            for k in app.database.list_api_keys()
        ],
    }
    context.update(system_status())
    return context


def fetch_log(log_file="service.log", lines: int = 100) -> dict:
    """The log tail as {"log": [lines]} (reference views.py:32-41)."""
    return {"log": log_tail(log_file, lines).splitlines()}


def view_endpoint(app, endpoint_id) -> dict:
    """Status of one registered algorithm endpoint (reference views.py:44-67)."""
    if app is None:
        from platipy_tpu.backend.application import app as _app

        app = _app
    for name, algorithm in app.algorithms.items():
        if name == endpoint_id or str(endpoint_id) == str(id(algorithm)):
            return {
                "name": algorithm.name,
                "default_settings": algorithm.default_settings,
            }
    return {"error": f"unknown endpoint {endpoint_id}"}


def add_endpoint(app=None) -> dict:
    """Endpoint-creation context (reference views.py:26-29 renders a form;
    algorithm registration here happens via ``app.register``)."""
    if app is None:
        from platipy_tpu.backend.application import app as _app

        app = _app
    return {"algorithms": list(app.algorithms)}


TEMPLATES_DIR = Path(__file__).parent / "templates"
STATIC_DIR = Path(__file__).parent / "static"

_JINJA_ENV = None


def _jinja_env():
    """Lazy jinja2 Environment over backend/templates (parity with the
    reference's Flask template rendering, backend/views.py:26-112)."""
    global _JINJA_ENV
    if _JINJA_ENV is None:
        import jinja2

        _JINJA_ENV = jinja2.Environment(
            loader=jinja2.FileSystemLoader(str(TEMPLATES_DIR)),
            autoescape=True,
        )
    return _JINJA_ENV


def _base_context(app) -> dict:
    return {
        "app_name": app.name,
        "worker": app.task_runner is not None,
        "algorithms": [
            {"name": a.name} for a in app.algorithms.values()
        ],
    }


def render_template(name: str, app, **context) -> str:
    ctx = _base_context(app)
    ctx.update(context)
    return _jinja_env().get_template(name).render(**ctx)


def task_rows(app):
    return [
        {
            "id": task_id,
            "algorithm": str(task.get("algorithm", "")),
            "state": str(task.get("state", "")),
            "error": str(task.get("error", "") or ""),
        }
        for task_id, task in list(app.task_runner.tasks.items())
    ]


def render_status_page(app) -> str:
    """The dashboard status page (reference templates/status.html)."""
    context = fetch_status(app)
    return render_template(
        "status.html", app,
        active="status",
        system=system_status(),
        dicom_listener=context["dicom_listener"],
        applications=context["applications"],
        tasks=task_rows(app),
    )


def render_log_page(app, log_file="service.log") -> str:
    """The live log view (reference templates/dashboard.html log panel)."""
    return render_template(
        "dashboard.html", app, active="logs", log=log_tail(log_file)
    )


def render_endpoint_page(app, endpoint_id) -> str:
    import json as _json

    info = view_endpoint(app, endpoint_id)
    if "error" in info:
        return render_template(
            "endpoint_add.html", app, active="add",
            algorithms=list(app.algorithms),
        )
    info = dict(info)
    info["default_settings_json"] = _json.dumps(
        info.get("default_settings"), indent=2, default=str
    )
    return render_template("endpoint_view.html", app, endpoint=info)


def render_endpoint_add_page(app) -> str:
    return render_template(
        "endpoint_add.html", app, active="add", algorithms=list(app.algorithms)
    )


def static_file(path: str):
    """Resolve a /static/<path> request to (bytes, content_type) or None.

    Path-traversal safe: the resolved path must stay inside STATIC_DIR.
    """
    import mimetypes

    target = (STATIC_DIR / path.lstrip("/")).resolve()
    try:
        target.relative_to(STATIC_DIR.resolve())
    except ValueError:
        return None
    if not target.is_file():
        return None
    ctype = mimetypes.guess_type(str(target))[0] or "application/octet-stream"
    return target.read_bytes(), ctype
