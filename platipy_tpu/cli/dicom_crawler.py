"""DICOM crawler CLI (reference: platipy/cli/dicom_crawler.py)."""

import click

from platipy_tpu.dicom.io.crawl import process_dicom_directory


@click.command()
@click.option("--input_dir", "-i", required=True, type=click.Path(exists=True),
              help="Directory to crawl for DICOM files")
@click.option("--output_dir", "-o", default=".", type=click.Path(),
              help="Directory in which to write NIfTI output")
@click.option("--sort_by", "-b", default="PatientName",
              help="DICOM field on which to sort output (PatientName/PatientID)")
def click_command(input_dir, output_dir, sort_by):
    """Crawl a directory of DICOM files and convert to NIfTI."""
    output = process_dicom_directory(
        input_dir, parent_sorting_field=sort_by, output_directory=output_dir
    )
    for parent, files in output.items():
        print(parent)
        for name, path in files.items():
            print(f"  {name}: {path}")
