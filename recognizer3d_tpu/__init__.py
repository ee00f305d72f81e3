"""recognizer3d_tpu — a TPU-native (JAX / XLA / Pallas / pjit) 3D point-cloud
segmentation framework with the capabilities of ``matthiasverstraete/3d_recognizer``.

Public surface mirrors the reference's ``randlanet`` package
(``/root/reference/randlanet/__init__.py:1-11``):

    from recognizer3d_tpu import (
        Model, RandLANetSettings, TrainingSettings, AugmentationSettings,
    )

plus the app-level data layer (``Dataset``, ``DatasetMerged``,
``broaden_annotation`` — reference ``dataset.py``).
"""

from recognizer3d_tpu.models.settings import RandLANetSettings
from recognizer3d_tpu.training.settings import TrainingSettings
from recognizer3d_tpu.data.augmentation import AugmentationSettings
from recognizer3d_tpu.models.facade import Model
from recognizer3d_tpu.data.dataset import Dataset, DatasetMerged, broaden_annotation

__all__ = [
    "Model",
    "RandLANetSettings",
    "TrainingSettings",
    "AugmentationSettings",
    "Dataset",
    "DatasetMerged",
    "broaden_annotation",
]

__version__ = "0.1.0"
