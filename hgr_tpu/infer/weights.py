"""Weight loading for the inference pipeline: orbax / npz / reference ckpt
for the classifier; npz / ONNX for the detector; random init fallback for
smoke runs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def load_classifier_weights(
    path: str,
    image_size: Tuple[int, int] = (192, 192),
) -> Dict[str, Any]:
    """Classifier variables from orbax dir / .npz / reference .ckpt.

    Empty path -> freshly-initialized random weights (smoke testing).
    """
    from hgr_tpu.models import MultiTaskNet

    model = MultiTaskNet(image_size=image_size)
    if not path:
        return model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1,) + tuple(image_size) + (3,)),
                          train=False)
    if path.endswith(".npz"):
        from hgr_tpu.infer.export import load_weights_npz

        return load_weights_npz(path)
    if path.endswith(".ckpt"):
        from hgr_tpu.utils.torch_port import load_reference_checkpoint

        return load_reference_checkpoint(path)
    # orbax checkpoint directory: saved payload {step, params,
    # batch_stats, opt_state}
    import orbax.checkpoint as ocp

    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1,) + tuple(image_size) + (3,)),
                          train=False)
    ckptr = ocp.StandardCheckpointer()
    # try a bare variables payload first, then the train-state layout
    try:
        restored = ckptr.restore(os.path.abspath(path), template)
        return restored
    except Exception:
        from hgr_tpu.train.state import create_train_state

        state, _ = create_train_state(
            model, jax.random.PRNGKey(0),
            (1,) + tuple(image_size) + (3,), lr=1e-3, milestones_steps=())
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = ckptr.restore(os.path.abspath(path), payload)
        return {"params": restored["params"],
                "batch_stats": restored["batch_stats"]}


def load_detector_weights(
    path: str,
    det_img_size: int = 416,
) -> Dict[str, Any]:
    """Detector variables from .npz (flax paths) or .onnx (gated on the
    onnx package). Empty path -> random init (smoke testing)."""
    from hgr_tpu.models.yolo import YOLOv7Tiny, load_npz_weights

    if path and path.endswith(".npz"):
        return load_npz_weights(path)
    if path and path.endswith(".onnx"):
        from hgr_tpu.utils.onnx_port import port_yolov7_tiny_onnx

        return port_yolov7_tiny_onnx(path)
    model = YOLOv7Tiny(num_classes=1)
    return model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, det_img_size, det_img_size, 3)), train=False)
