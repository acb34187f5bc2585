"""Pinnacle RT export service shim (reference: services/pinnacle/service.py:37).

The reference wraps the pymedphys pinnacle export tool; gated here.
"""

import logging

from platipy_tpu.backend.application import app

logger = logging.getLogger(__name__)

PINNACLE_SETTINGS_DEFAULTS = {"export_modalities": ["CT", "RTSTRUCT", "RTDOSE"]}


@app.register("Pinnacle Export", default_settings=PINNACLE_SETTINGS_DEFAULTS)
def pinnacle_service(data_objects, working_dir, settings):
    try:
        from pymedphys.experimental import pinnacle  # type: ignore
    except ImportError as err:
        raise RuntimeError(
            "Pinnacle export requires pymedphys, which is not installed in this "
            "environment."
        ) from err
    raise NotImplementedError("Pinnacle export wiring requires pymedphys")
