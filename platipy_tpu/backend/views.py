"""Web dashboard views (reference: platipy/backend/views.py:32-106).

A minimal HTML status page served by the stdlib API server: registered
algorithms, task states, system status (via psutil when available), and the
log tail.
"""

from __future__ import annotations

import html
import logging
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = [
    "render_status_page",
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


def render_status_page(app) -> str:
    """The dashboard HTML (algorithms, tasks, system)."""
    rows = []
    for task_id, task in list(app.task_runner.tasks.items()):
        rows.append(
            f"<tr><td>{html.escape(task_id)}</td>"
            f"<td>{html.escape(str(task.get('algorithm', '')))}</td>"
            f"<td>{html.escape(str(task.get('state', '')))}</td>"
            f"<td>{html.escape(str(task.get('error', '')))}</td></tr>"
        )
    algos = "".join(
        f"<li>{html.escape(a.name)}</li>" for a in app.algorithms.values()
    )
    status = "".join(
        f"<li>{html.escape(k)}: {v}</li>" for k, v in system_status().items()
    )
    return f"""<!DOCTYPE html>
<html><head><title>{html.escape(app.name)} service</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
td,th{{border:1px solid #ccc;padding:4px 8px}}</style></head>
<body>
<h1>{html.escape(app.name)} segmentation service</h1>
<h2>Algorithms</h2><ul>{algos}</ul>
<h2>System</h2><ul>{status}</ul>
<h2>Tasks</h2>
<table><tr><th>Task</th><th>Algorithm</th><th>State</th><th>Error</th></tr>
{''.join(rows)}</table>
</body></html>"""
