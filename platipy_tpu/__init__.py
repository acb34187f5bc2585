"""platipy_tpu — a TPU-native medical imaging framework.

A from-scratch rebuild of the capabilities of pyplati/platipy on JAX / XLA /
Pallas: image registration (linear, demons, B-spline), label fusion and
comparison, multi-atlas segmentation pipelines, synthetic deformation,
dose analysis, visualisation, DICOM/NIfTI I/O, a service backend, and a CLI —
with the compute core running on TPU device meshes instead of ITK's C++
threads.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Some jax builds register a default platform plugin that wins over the
    # JAX_PLATFORMS environment variable; apply it through the config API so
    # the documented env var always works (subprocess tests and CLI runs set
    # JAX_PLATFORMS=cpu and must NOT fall through to a device tunnel).
    #
    # The env var may NARROW the current platform list, or redirect it to
    # exactly "cpu" — the always-present local backend that cannot hang, and
    # the documented escape hatch (jax seeds its config from the env var at
    # import, so a process that imported jax under the profile's
    # JAX_PLATFORMS=<tunnel> and then sets JAX_PLATFORMS=cpu must still land
    # on cpu).  It must never WIDEN or swap toward a device tunnel: a caller
    # that already ran jax.config.update("jax_platforms", "cpu") before
    # importing this package keeps cpu even when the login profile exports
    # the tunnel platform (clobbering that to the tunnel hangs every op
    # during tunnel outages).
    import jax as _jax

    try:
        _env_platforms = [
            p.strip().lower()
            for p in _os.environ["JAX_PLATFORMS"].split(",")
            if p.strip()
        ]
        _current = _jax.config.jax_platforms or ""
        _current_platforms = {
            p.strip().lower() for p in _current.split(",") if p.strip()
        }
        if (not _current_platforms
                or set(_env_platforms) <= _current_platforms
                or _env_platforms == ["cpu"]):
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - unknown platform string
        pass

from platipy_tpu.core.image import Image, from_array, like  # noqa: F401
