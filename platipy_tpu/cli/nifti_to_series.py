"""NIfTI to DICOM series CLI (reference: platipy/cli/nifti_to_series.py)."""

import click

from platipy_tpu.dicom.io.nifti_to_series import convert_nifti_to_dicom_series


@click.command()
@click.option("--nifti_file", "-i", required=True, type=click.Path(exists=True))
@click.option("--reference_dcm", "-r", default=None, type=click.Path(),
              help="Reference DICOM series for patient tags")
@click.option("--output_dir", "-o", default=".", type=click.Path())
def click_command(nifti_file, reference_dcm, output_dir):
    """Convert a NIfTI image to a DICOM series."""
    paths = convert_nifti_to_dicom_series(
        nifti_file, reference_dcm=reference_dcm, output_directory=output_dir
    )
    print(f"wrote {len(paths)} slices to {output_dir}")
