"""Service management CLI (reference: platipy/backend/manage.py:26-180)."""

from __future__ import annotations

import logging

import click

logger = logging.getLogger(__name__)

DEFAULT_DB = "./service.db"


def create_db(database=DEFAULT_DB):
    """Create/initialise the service database (reference manage.py:26-31)."""
    from platipy_tpu.backend.models import Database

    return Database(database)


def add_api_key(name, is_admin=False, database=DEFAULT_DB):
    """Add an API key and return it (reference manage.py:34-45)."""
    from platipy_tpu.backend.models import Database

    db = Database(database)
    return db.add_api_key(name, is_admin=is_admin)


@click.group()
def cli():
    """Manage the platipy_tpu segmentation service."""


@cli.command()
@click.option("--database", "-d", default=DEFAULT_DB)
def initdb(database):
    """Initialise the service database."""
    from platipy_tpu.backend.models import Database

    Database(database)
    print(f"Database initialised at {database}")


@cli.command()
@click.argument("name")
@click.option("--database", "-d", default=DEFAULT_DB)
def key(name, database):
    """Generate an API key for a user/service."""
    from platipy_tpu.backend.models import Database

    db = Database(database)
    api_key = db.add_api_key(name)
    print(f"API key for {name}: {api_key}")


@cli.command()
@click.option("--database", "-d", default=DEFAULT_DB)
def keys(database):
    """List API keys."""
    from platipy_tpu.backend.models import Database

    db = Database(database)
    for row in db.list_api_keys():
        print(f"  {row['name']}: {row['key']}")


@cli.command()
@click.option("--ip", "-ip", required=True, help="IP address of service")
@click.option("--out", "-o", default=".", help="Directory for cert/key files")
def ssl(ip, out):
    """Generate a self-signed SSL certificate for the service
    (reference manage.py:94-123, which shells out to openssl likewise)."""
    import subprocess
    from pathlib import Path

    out_dir = Path(out)
    out_dir.mkdir(parents=True, exist_ok=True)
    cert, key_file = out_dir / "service.crt", out_dir / "service.key"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-nodes", "-days", "365",
            "-newkey", "rsa:2048",
            "-keyout", str(key_file), "-out", str(cert),
            "-subj", f"/CN={ip}",
            "-addext", f"subjectAltName=IP:{ip}",
        ],
        check=True,
    )
    print(f"Wrote {cert} and {key_file}")


def run_celery():
    """Start the background worker loop (reference manage.py:126-140 starts a
    Celery worker + beat; the thread-pool runner starts with the service, so
    this runs the DICOM listener + periodic clean-up in the foreground)."""
    import time

    from platipy_tpu.backend.application import app
    from platipy_tpu.backend.tasks import clean_up_task

    import threading

    listener = threading.Thread(target=app.run_dicom_listener, daemon=True)
    listener.start()
    while True:
        clean_up_task(app)
        time.sleep(3600)


@cli.command()
@click.option("--host", "-h", default="0.0.0.0")
@click.option("--port", "-p", default=8000)
@click.option("--database", "-d", default=DEFAULT_DB)
@click.option("--service", "-s", default=None,
              help="Import path of a module that registers algorithms on "
                   "platipy_tpu.backend.application.app")
@click.option("--workers", "-w", default=1)
@click.option("--certfile", default=None, help="TLS certificate (serve HTTPS)")
@click.option("--keyfile", default=None, help="TLS private key")
def run(host, port, database, service, workers, certfile, keyfile):
    """Run the segmentation service (REST API + worker pool)."""
    import importlib

    from platipy_tpu.backend.application import app
    from platipy_tpu.backend.models import Database
    from platipy_tpu.backend.tasks import TaskRunner

    app.database = Database(database)
    app.task_runner = TaskRunner(app.database, max_workers=workers)

    if service:
        importlib.import_module(service)

    print(f"Registered algorithms: {list(app.algorithms)}")
    app.run(host=host, port=port, certfile=certfile, keyfile=keyfile)
