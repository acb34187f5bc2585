"""Sphinx configuration for the platipy_tpu documentation
(counterpart of /root/reference/docs/conf.py)."""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

# keep autodoc imports on the CPU backend
os.environ.setdefault("JAX_PLATFORMS", "cpu")

project = "platipy_tpu"
author = "platipy_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.autosummary",
]

autodoc_member_order = "bysource"
autodoc_mock_imports = []
autosummary_generate = True

templates_path = ["_templates"]
exclude_patterns = ["_build"]

html_theme = "alabaster"
html_static_path = ["_static"]
