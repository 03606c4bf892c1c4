"""Data subsystem: annotation reading, host staging, device-side augment."""

from hgr_tpu.data.dataset import AnnotationIndex, read_annotations  # noqa: F401
from hgr_tpu.data.pipeline import (  # noqa: F401
    AugmentParams,
    apply_augment_batch,
    draw_augment_params,
    stage_image,
)
