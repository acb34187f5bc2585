"""Segmentation CLI command (reference: platipy/cli/segmentation.py:57-128)."""

import json
import logging
import os

import click

logger = logging.getLogger(__name__)

segmentation_algorithms = {}

from platipy_tpu.projects.bronchus.run import (  # noqa: E402
    BRONCHUS_SETTINGS_DEFAULTS,
    run_bronchus_segmentation,
)
from platipy_tpu.projects.cardiac.run import (  # noqa: E402
    CARDIAC_SETTINGS_DEFAULTS,
    HYBRID_SETTINGS_DEFAULTS,
    run_cardiac_segmentation,
    run_hybrid_segmentation,
)
from platipy_tpu.projects.multiatlas.run import (  # noqa: E402
    MUTLIATLAS_SETTINGS_DEFAULTS,
)
from platipy_tpu.projects.multiatlas.run import (  # noqa: E402
    run_segmentation as run_multiatlas_segmentation,
)

segmentation_algorithms["cardiac"] = {
    "algorithm": run_hybrid_segmentation,
    "default_settings": HYBRID_SETTINGS_DEFAULTS,
}
segmentation_algorithms["cardiac_atlas"] = {
    "algorithm": run_cardiac_segmentation,
    "default_settings": CARDIAC_SETTINGS_DEFAULTS,
}
segmentation_algorithms["multiatlas"] = {
    "algorithm": run_multiatlas_segmentation,
    "default_settings": MUTLIATLAS_SETTINGS_DEFAULTS,
}
segmentation_algorithms["bronchus"] = {
    "algorithm": run_bronchus_segmentation,
    "default_settings": BRONCHUS_SETTINGS_DEFAULTS,
}


def _default_json(settings):
    def clean(obj):
        if isinstance(obj, dict):
            return {k: clean(v) for k, v in obj.items() if not callable(v)}
        if isinstance(obj, (list, tuple)):
            return [clean(v) for v in obj]
        if callable(obj):
            return None
        return obj

    return json.dumps(clean(settings), indent=4, default=str)


@click.command()
@click.argument("algorithm", nargs=1, type=click.Choice(segmentation_algorithms.keys()))
@click.argument("input_path", nargs=1, type=click.Path(), required=False)
@click.option("--config", "-c", required=False, type=click.Path(),
              help="Path to JSON file containing algorithm settings")
@click.option("--default", "-d", is_flag=True,
              help="Print the default configuration for the selected algorithm")
@click.option("--output", "-o", required=False, type=click.Path(),
              help="Path to directory for output")
def click_command(algorithm, input_path, config, default, output):
    """Run an auto-segmentation on an input image.

    Pass the path to a NIfTI image OR a directory containing a DICOM series.
    """
    algorithm_config = segmentation_algorithms[algorithm]["default_settings"]

    if default:
        print(_default_json(algorithm_config))
        return

    if not input_path:
        print("Supply the path the the Nifti Image OR DICOM series to process")
        return

    print(f"Running {algorithm} segmentation")

    if config:
        with open(config, "r") as file_obj:
            algorithm_config = json.load(file_obj)

    from platipy_tpu.nifti.io import read_image

    if os.path.isdir(input_path):
        from platipy_tpu.dicom.io.series import read_dicom_series

        image = read_dicom_series(input_path)
    else:
        image = read_image(input_path)

    results = segmentation_algorithms[algorithm]["algorithm"](image, algorithm_config)
    if isinstance(results, tuple):
        results = results[0]

    if not output:
        output = "."
    os.makedirs(output, exist_ok=True)

    from platipy_tpu.nifti.io import write_image

    for result in results:
        write_image(results[result], os.path.join(output, f"{result}.nii.gz"))
        print(f"  wrote {result}.nii.gz")
