#!/usr/bin/env bash
# Service container entrypoint.
#
# Counterpart of the reference's entrypoint.sh (redis + celery beat/worker +
# DICOM-listener task + gunicorn).  platipy_tpu's backend runs the task
# runner, the DICOM listener, and the REST server inside one process
# (backend/manage.py run), so the entrypoint reduces to database init +
# optional SSL detection + a single `manage run`.
set -e

DB=${DATABASE:-/data/service.db}

# Initialise the service database on first boot.
if [ ! -f "$DB" ]; then
    echo "Initialising service database at $DB"
    manage initdb --database "$DB"
fi

CERT_FILE=service.crt
KEY_FILE=service.key
SSL_ARGS=""
if [ -f "$CERT_FILE" ] && [ -f "$KEY_FILE" ]; then
    echo "SSL certificates found. Serving over HTTPS."
    SSL_ARGS="--certfile $CERT_FILE --keyfile $KEY_FILE"
else
    echo "WARNING: no SSL certificates found. Generate them with 'manage ssl'."
    echo "Running without SSL, not suitable for production use."
fi

# Docker CMD semantics: the image's default CMD is a bare "manage" sentinel
# selecting the full serve command below; any more specific command (e.g. the
# compose worker's `manage run --port 8000`) is exec'd as-is — appending CMD
# to the complete default line would hand click an unexpected extra argument.
if [ "$#" -gt 1 ] || { [ "$#" -eq 1 ] && [ "$1" != "manage" ]; }; then
    exec "$@"
fi

# service.py in the WORKDIR defines the app (algorithm registration);
# `manage run` imports it, starts the DICOM listener task and the task
# runner threads, then serves the REST API.
exec manage run --host 0.0.0.0 --port 8000 --database "$DB" \
    --service service $SSL_ARGS
