"""NIfTI to RTSTRUCT CLI (reference: platipy/cli/nifti_to_rtstruct.py)."""

import click

from platipy_tpu.dicom.io.nifti_to_rtstruct import convert_nifti


@click.command()
@click.option("--dcm_path", "-d", required=True, type=click.Path(exists=True),
              help="Directory containing the reference DICOM series")
@click.option("--mask", "-m", multiple=True, required=True,
              help="Mask pairs name,path (repeatable) or just paths")
@click.option("--output_file", "-o", required=True, type=click.Path(),
              help="Output RTSTRUCT file path")
def click_command(dcm_path, mask, output_file):
    """Convert NIfTI mask(s) to a DICOM RTSTRUCT."""
    masks = {}
    for m in mask:
        if "," in m:
            name, path = m.split(",", 1)
            masks[name] = path
        else:
            from pathlib import Path

            masks[Path(m).name.replace(".nii.gz", "").replace(".nii", "")] = m
    convert_nifti(dcm_path, masks, output_file)
    print(f"wrote {output_file}")
