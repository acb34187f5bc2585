#!/usr/bin/env python
"""PlatiPy-TPU CLI dispatcher (reference: platipy/cli/run.py:32-71)."""

import logging
import os
import sys

logger = logging.getLogger(__name__)


def _configure_compilation_cache():
    """Point jax at a persistent compilation cache so repeat CLI invocations
    skip XLA compiles (each CLI run is a fresh process; without this a
    segmentation pays the full compile cost every time).  Honour an existing
    JAX_COMPILATION_CACHE_DIR; opt out with PLATIPY_TPU_NO_COMPILE_CACHE=1."""
    if os.environ.get("PLATIPY_TPU_NO_COMPILE_CACHE") == "1":
        return
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".platipy_tpu", "jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as err:  # cache is an optimisation, never fatal
        logger.debug("Compilation cache unavailable: %s", err)


_configure_compilation_cache()

from platipy_tpu.cli import (  # noqa: E402
    dicom_crawler,
    nifti_to_rtstruct,
    nifti_to_series,
    rtstruct_to_nifti,
    segmentation,
    tcia_download,
)

tools = {
    "dicom_crawler": dicom_crawler.click_command,
    "segmentation": segmentation.click_command,
    "nifti_to_rtstruct": nifti_to_rtstruct.click_command,
    "rtstruct_to_nifti": rtstruct_to_nifti.click_command,
    "nifti_to_series": nifti_to_series.click_command,
    "tcia-download": tcia_download.click_command,
}

try:
    from platipy_tpu.backend.manage import cli as manage_cli

    tools["manage"] = manage_cli
except ImportError:
    logger.info("Backend service functionality not available.")


def platipy_cli():
    """Run the PlatiPy-TPU Command Line Interface."""
    if len(sys.argv) == 1 or sys.argv[1] not in tools:
        print("")
        print("  PlatiPy-TPU CLI (Command Line Interface)")
        print("  ----------------------------------------")
        print("")
        print("  Usage: platipy_tpu [tool]")
        print("")
        print("  Supply the name of the desired tool:")
        for key in tools:
            print(f"    {key}")
        print("")
        sys.exit()

    tool = sys.argv[1]
    del sys.argv[1]
    tools[tool]()


if __name__ == "__main__":
    platipy_cli()
