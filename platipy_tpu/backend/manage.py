"""Service management CLI (reference: platipy/backend/manage.py:26-180)."""

from __future__ import annotations

import logging

import click

logger = logging.getLogger(__name__)

DEFAULT_DB = "./service.db"


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
@click.option("--host", "-h", default="0.0.0.0")
@click.option("--port", "-p", default=8000)
@click.option("--database", "-d", default=DEFAULT_DB)
@click.option("--service", "-s", default=None,
              help="Import path of a module that registers algorithms on "
                   "platipy_tpu.backend.application.app")
@click.option("--workers", "-w", default=1)
def run(host, port, database, service, workers):
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
    app.run(host=host, port=port)
