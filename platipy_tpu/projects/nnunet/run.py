"""CNN segmentation entry point — drop-in mirror of
platipy/imaging/projects/nnunet/run.py (reference lines 13-195).

The reference shells out to PyTorch nnU-Net via a tempdir NIfTI round trip;
here inference is the native Flax U-Net with on-device sliding-window tiling.
The output contract is identical: a dict of ``Struct_{i}`` binary masks, one
per label value.

Model weights resolve in order: ``settings["params"]`` (in-memory pytree),
``settings["model_path"]`` (orbax checkpoint), the ``PLATIPY_TPU_MODELS``
directory for the named model.  The Zenodo model registry is preserved for
provenance; converting the reference's torch weights requires a host with
network+torch and is provided by ``convert_torch_checkpoint`` when available.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.projects.nnunet.inference import predict_image
from platipy_tpu.projects.nnunet.model import default_unet

logger = logging.getLogger(__name__)

__all__ = [
    "NNUNET_SETTINGS_DEFAULTS",
    "available_nnunet_models",
    "setup_nnunet_environment",
    "install_nnunet_model_from_zip",
    "download_and_install_nnunet_task",
    "run_segmentation",
    "save_checkpoint",
    "load_checkpoint",
]

MODELS_PATH = os.environ.get(
    "PLATIPY_TPU_MODELS",
    str(Path.home().joinpath(".platipy_tpu", "models")),
)

# provenance registry (reference nnunet/run.py:13-38).  "features"/"strides"
# pin the nnU-Net v1 Generic_UNet architecture the checkpoint was trained
# with (ExperimentPlanner defaults: base 32 features doubling to the 320 cap,
# conv_per_stage=2, five pool steps with the final pool anisotropic [1,2,2]
# for the short z axis) — ``convert_nnunet_statedict`` itself is
# plan-agnostic, these let ``build_registry_unet`` construct the matching
# Flax model without the plan pickle.
NNUNET_MODEL_REGISTRY = {
    "Task400_OPEN_HEART_1FOLD": {
        "url": "https://zenodo.org/record/6585664/files/Task400_OPEN_HEART_1FOLD.zip?download=1",
        "description": "Whole-heart CT segmentation (open data, 1 fold)",
        "num_classes": 2,
        "target_spacing": (1.5, 1.5, 2.0),
        "tile_shape": (32, 128, 128),
        "features": (32, 64, 128, 256, 320, 320),
        "strides": (
            (1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2),
        ),
    },
}


def build_registry_unet(task: str, deep_supervision: bool = False,
                        compute_dtype=jnp.bfloat16):
    """UNet3D matching a registry entry's pinned Generic_UNet architecture
    (use with ``convert_nnunet_statedict(sd, n_stages=len(features))``)."""
    from platipy_tpu.projects.nnunet.model import UNet3D

    entry = NNUNET_MODEL_REGISTRY[task]
    return UNet3D(
        num_classes=entry["num_classes"],
        features=tuple(entry["features"]),
        strides=tuple(entry["strides"]),
        deep_supervision=deep_supervision,
        compute_dtype=compute_dtype,
    )

NNUNET_SETTINGS_DEFAULTS = {
    "task": "Task400_OPEN_HEART_1FOLD",
    "config": "3d_lowres",
    "trainer": "nnUNetTrainerV2",
    "clean_sup_slices": False,
    "folds": None,
    "params": None,        # in-memory parameter pytree
    "model_path": None,    # orbax checkpoint directory
    "features": (32, 64, 128, 256),
    "strides": None,   # None = registry entry, else nnU-Net default rule
    "num_classes": 2,
    "target_spacing": (1.5, 1.5, 2.0),
    "tile_shape": (32, 128, 128),
}


def available_nnunet_models() -> Dict:
    """The model registry (reference run.py:13-38 semantics)."""
    return NNUNET_MODEL_REGISTRY


def setup_nnunet_environment():
    """Prepare the model directory (reference sets nnU-Net env vars,
    run.py:57-72; here a single models directory suffices)."""
    Path(MODELS_PATH).mkdir(parents=True, exist_ok=True)
    os.environ["PLATIPY_TPU_MODELS"] = MODELS_PATH
    return MODELS_PATH


def install_nnunet_model_from_zip(zip_path, task_name: str):
    """Install a reference nnU-Net model zip: extract, convert the fold-0
    torch checkpoint to this framework's parameters, save as an orbax
    checkpoint under the models directory (reference installs via
    nnunet install_model_from_zip_file, run.py:74-102)."""
    import tempfile
    import zipfile

    from platipy_tpu.projects.nnunet.convert import load_nnunet_checkpoint

    setup_nnunet_environment()
    info = NNUNET_MODEL_REGISTRY.get(task_name, {})
    n_stages = len(NNUNET_SETTINGS_DEFAULTS["features"])

    with tempfile.TemporaryDirectory() as temp_dir:
        with zipfile.ZipFile(str(zip_path), "r") as zf:
            zf.extractall(temp_dir)
        candidates = sorted(Path(temp_dir).rglob("model_final_checkpoint.model"))
        if not candidates:
            candidates = sorted(Path(temp_dir).rglob("*.model"))
        if not candidates:
            raise FileNotFoundError(f"no nnU-Net checkpoint found in {zip_path}")
        params = load_nnunet_checkpoint(str(candidates[0]), n_stages=n_stages)
        out = Path(MODELS_PATH) / task_name
        save_checkpoint(params, out)
        logger.info("Installed %s -> %s", task_name, out)
    return str(Path(MODELS_PATH) / task_name), info


def download_and_install_nnunet_task(task_name: str, zip_url: str):
    """Download a model zip and install it (reference run.py:74-102; the
    torch weights are converted to native parameters instead of installed
    into an nnU-Net results folder)."""
    import tempfile
    import urllib.request

    with tempfile.NamedTemporaryFile(suffix=".zip") as tmp:
        logger.info("Downloading %s", zip_url)
        urllib.request.urlretrieve(zip_url, tmp.name)
        return install_nnunet_model_from_zip(tmp.name, task_name)


def save_checkpoint(params, path):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(str(path), params, force=True)


def load_checkpoint(path):
    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    return checkpointer.restore(str(Path(path).absolute()))


def _resolve_params(settings):
    if settings.get("params") is not None:
        return settings["params"]
    model_path = settings.get("model_path")
    if model_path is None:
        candidate = Path(MODELS_PATH) / settings["task"]
        if candidate.exists():
            model_path = candidate
    if model_path is not None and Path(model_path).exists():
        logger.info("Loading model parameters from %s", model_path)
        return load_checkpoint(model_path)
    raise FileNotFoundError(
        f"No model parameters found for task {settings['task']!r}. Provide "
        "settings['params'] (in-memory), settings['model_path'] (orbax "
        f"checkpoint), or install a checkpoint under {MODELS_PATH}."
    )


def run_segmentation(img: Image, settings=NNUNET_SETTINGS_DEFAULTS) -> Dict[str, Image]:
    """Run CNN segmentation; returns ``{"Struct_0": mask, ...}`` per label
    value (reference run.py:105-195 output contract)."""
    settings = {**NNUNET_SETTINGS_DEFAULTS, **settings}
    registry = NNUNET_MODEL_REGISTRY.get(settings["task"], {})
    num_classes = settings.get("num_classes") or registry.get("num_classes", 2)
    target_spacing = settings.get("target_spacing") or registry.get(
        "target_spacing", (1.5, 1.5, 2.0)
    )
    tile_shape = tuple(settings.get("tile_shape") or registry.get("tile_shape", (32, 128, 128)))

    params = _resolve_params(settings)
    strides = settings.get("strides") or registry.get("strides")
    model = default_unet(num_classes=num_classes,
                         features=tuple(settings["features"]), strides=strides)

    labels = predict_image(
        model.apply, params, img, num_classes,
        target_spacing=target_spacing, tile_shape=tile_shape,
    )

    labels_arr = np.asarray(labels.array)
    results = {}
    # reference splits per label value as Struct_{i-1} for labels 1..K
    for i in range(1, int(labels_arr.max()) + 1):
        results[f"Struct_{i - 1}"] = labels.with_array(
            jnp.asarray((labels_arr == i).astype(np.uint8))
        )
    return results
