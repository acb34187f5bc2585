"""DICOM crawler CLI (reference: platipy/cli/dicom_crawler.py:29-140)."""

import logging

import click

from platipy_tpu.dicom.io.crawl import process_dicom_directory

logger = logging.getLogger(__name__)


@click.command()
@click.option("--input_dir", "-i", required=True, type=click.Path(exists=True),
              help="Input DICOM directory, at the same level as the parent "
                   "field (default=PatientName).")
@click.option("--output_dir", "-o", default="./", show_default=True,
              type=click.Path(),
              help="Output directory. A folder structure is created here.")
@click.option("--sort_by", "-b", default="PatientName", show_default=True,
              help="DICOM tag to sort at the highest level.")
@click.option("--image_format",
              default="{parent_sorting_data}_{study_uid_index}_{Modality}_{image_desc}_{SeriesNumber}",
              show_default=True,
              help="Format for output images. Special fields: "
                   "parent_sorting_data, study_uid_index, image_desc; any "
                   "DICOM header keyword also works (missing ones become 0).")
@click.option("--structure_format",
              default="{parent_sorting_data}_{study_uid_index}_{Modality}_{structure_name}",
              show_default=True,
              help="Format for output structures; adds structure_name.")
@click.option("--dose_format",
              default="{parent_sorting_data}_{study_uid_index}_{DoseSummationType}",
              show_default=True,
              help="Format for output radiotherapy dose distributions.")
@click.option("--overwrite", is_flag=True, default=False, show_default=True,
              help="Overwrite files if they exist.")
@click.option("--file_suffix", default=".nii.gz", show_default=True,
              help="Output file suffix. Defines the file type.")
@click.option("--short_description", "-s", is_flag=True, default=False,
              show_default=True,
              help="Use less verbose descriptions for DICOM images.")
@click.option("--verbose", "-v", is_flag=True, default=False,
              show_default=True, help="Print more information while running.")
def click_command(input_dir, output_dir, sort_by, image_format,
                  structure_format, dose_format, overwrite, file_suffix,
                  short_description, verbose):
    """DICOM DIRECTORY CRAWLER: bulk-convert DICOM to NIfTI (or another
    format via --file_suffix) with templated output naming."""
    if verbose:
        logging.basicConfig(level=logging.DEBUG)
    output = process_dicom_directory(
        input_dir,
        parent_sorting_field=sort_by,
        output_image_name_format=image_format,
        output_structure_name_format=structure_format,
        output_dose_name_format=dose_format,
        return_extra=not short_description,
        output_directory=output_dir,
        output_file_suffix=file_suffix,
        overwrite_existing_files=overwrite,
        verbose=verbose,
    )
    for parent, fields in (output or {}).items():
        print(parent)
        for field, paths in fields.items():
            for path in paths:
                print(f"  {field}: {path}")
