"""RTSTRUCT to NIfTI CLI (reference: platipy/cli/rtstruct_to_nifti.py)."""

import click

from platipy_tpu.dicom.io.rtstruct_to_nifti import convert_rtstruct


@click.command()
@click.option("--dcm_img", "-i", required=True, type=click.Path(exists=True),
              help="Directory containing the image DICOM series")
@click.option("--dcm_rt_file", "-r", required=True, type=click.Path(exists=True),
              help="The RTSTRUCT DICOM file")
@click.option("--prefix", "-p", default="Struct_", help="Output mask file prefix")
@click.option("--output_dir", "-od", default=".", type=click.Path(),
              help="Output directory")
@click.option("--output_img", "-oi", default=None, help="Also write the image volume")
@click.option("--spacing", "-sp", default=None,
              help="Resample to spacing, e.g. 1,1,2")
def click_command(dcm_img, dcm_rt_file, prefix, output_dir, output_img, spacing):
    """Convert an RTSTRUCT and its image series to NIfTI masks."""
    masks, names = convert_rtstruct(
        dcm_img, dcm_rt_file, prefix=prefix, output_dir=output_dir,
        output_img=output_img, spacing=spacing,
    )
    for name in names:
        print(f"  converted: {name}")
