"""TCIA download CLI (reference: platipy/cli/tcia_download.py)."""

import click

from platipy_tpu.dicom.download.tcia import fetch_data


@click.command()
@click.option("--collection", "-c", required=True, help="TCIA collection name")
@click.option("--patient", "-p", multiple=True, help="Patient ID(s) to fetch")
@click.option("--number_of_patients", "-n", default=1)
@click.option("--modality", "-m", multiple=True, help="Modalities to fetch")
@click.option("--output_dir", "-o", default=None, type=click.Path())
@click.option("--nifti/--no-nifti", default=True)
def click_command(collection, patient, number_of_patients, modality, output_dir, nifti):
    """Download data from The Cancer Imaging Archive."""
    result = fetch_data(
        collection,
        patient_ids=list(patient) or None,
        number_of_patients=number_of_patients,
        modalities=list(modality) or None,
        nifti=nifti,
        output_directory=output_dir,
    )
    for pid, path in result.items():
        print(f"  {pid}: {path}")
