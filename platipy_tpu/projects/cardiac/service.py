"""Import-path parity shim (reference platipy/imaging/projects/cardiac/service.py:36,93):
the deployable service functions live in ``services/cardiac/service.py``; this
module re-exports them under the reference's module path."""

import os
import sys

_SERVICES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))), "services"
)
if os.path.isdir(_SERVICES) and _SERVICES not in sys.path:
    sys.path.insert(0, os.path.dirname(_SERVICES))

try:
    from services.cardiac.service import (  # noqa: F401
        cardiac_service,
        cardiac_structure_guided_service,
    )
except ImportError:  # services/ not deployed alongside the package
    cardiac_service = None
    cardiac_structure_guided_service = None
