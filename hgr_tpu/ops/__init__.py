"""Device-side ops: geometry, warping, heatmaps, losses, metrics, color.

Everything here is pure jnp / lax — batched, static-shape, differentiable
where meaningful, and designed to fuse into jitted train/infer graphs.
"""

from hgr_tpu.ops.affine import (  # noqa: F401
    build_affine,
    invert_affine,
    transform_points,
    compose_affine,
)
from hgr_tpu.ops.warp import (  # noqa: F401
    affine_warp,
    batched_affine_warp,
    batched_affine_warp_twopass,
)
from hgr_tpu.ops.color import (  # noqa: F401
    fliplr_image,
    fliplr_joints,
    hsv_jitter,
    normalize_imagenet,
)
from hgr_tpu.ops.heatmap import generate_targets, get_max_preds  # noqa: F401
from hgr_tpu.ops.losses import joints_mse_loss, classification_loss, multitask_loss  # noqa: F401
from hgr_tpu.ops.metrics import pck_accuracy, ConfusionAccumulator, macro_f1_from_confusion  # noqa: F401
from hgr_tpu.ops.resize import upsample_bilinear_align_corners, resize_bilinear  # noqa: F401
from hgr_tpu.ops.posemb import pos_emb_sincos_2d  # noqa: F401
