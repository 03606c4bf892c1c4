"""Weight loading for the inference pipeline: orbax / npz / reference ckpt
for the classifier; npz / ONNX for the detector; random init fallback for
smoke runs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def read_run_meta(path: str) -> Optional[Dict[str, Any]]:
    """The training loop writes ``run_meta.json`` (backbone, image_size,
    num_joints, num_classes, compute_dtype) next to its checkpoints
    (train/loop.py:fit). Returns it, or None for artifacts that carry no
    meta (bare .npz/.ckpt files, foreign checkpoints). Searched in the
    checkpoint directory itself, then one level up (orbax paths are
    ``<run>/weight/{best,last}``; the meta sits in ``<run>/weight/``)."""
    if not path:
        return None
    p = os.path.abspath(path)
    dirs = ([os.path.dirname(p)] if not os.path.isdir(p)
            else [p, os.path.dirname(p)])
    for d in dirs:
        f = os.path.join(d, "run_meta.json")
        if os.path.exists(f):
            try:
                import json

                with open(f) as fh:
                    return json.load(fh)
            except (OSError, ValueError):
                return None
    return None


def resolve_image_size(path: str, flag_value,
                       default: Tuple[int, int] = (192, 192)
                       ) -> Tuple[int, int]:
    """Crop geometry for an inference surface: the explicit CLI flag
    wins, then the checkpoint's recorded run_meta.json, then
    ``default``. image_size never appears in a param shape, so a
    mismatch can't be detected from the weights — recording it at train
    time is the only guard against silently serving a 256-trained model
    at 192."""
    if flag_value:
        return (int(flag_value[0]), int(flag_value[1]))
    meta = read_run_meta(path)
    if meta and meta.get("image_size"):
        return tuple(int(v) for v in meta["image_size"])  # type: ignore
    return default


def infer_backbone_variant(variables: Dict[str, Any]) -> str:
    """'small' or 'large' from a loaded classifier tree's structure.

    GELAN_SPEC small/large share every channel width and differ only in
    blocks-per-chain (models/gelan.py:31-46), so a large checkpoint
    restores "cleanly" into a small model while flax silently ignores
    the extra cv2_1/cv3_1 ResBlocks — every output would be garbage with
    no error. The extra blocks ARE the discriminator: cspelan1/cv2_1
    exists iff the checkpoint came from the large variant.
    """
    params = variables.get("params", variables)
    try:
        block = params["encoder"]["cspelan1"]
    except (KeyError, TypeError):
        raise ValueError(
            "not a MultiTaskNet classifier tree: missing "
            "params/encoder/cspelan1") from None
    return "large" if "cv2_1" in block else "small"


def load_classifier_weights(
    path: str,
    image_size: Tuple[int, int] = (192, 192),
    backbone: str = "auto",
) -> Dict[str, Any]:
    """Classifier variables from orbax dir / .npz / reference .ckpt.

    Empty path -> freshly-initialized random weights (smoke testing).
    ``backbone``: 'small' | 'large' | 'auto'. File formats (.npz/.ckpt)
    carry their structure, so 'auto' costs nothing; orbax restore needs
    a matching template, so 'auto' tries small then large. For an empty
    path 'auto' means 'small'.
    """
    from hgr_tpu.models import MultiTaskNet

    if not path:
        model = MultiTaskNet(
            image_size=image_size,
            backbone="small" if backbone == "auto" else backbone)
        return model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1,) + tuple(image_size) + (3,)),
                          train=False)
    if path.endswith(".npz"):
        from hgr_tpu.infer.export import load_weights_npz

        loaded = load_weights_npz(path)
    elif path.endswith(".ckpt"):
        from hgr_tpu.utils.torch_port import load_reference_checkpoint

        loaded = load_reference_checkpoint(path)
    else:
        loaded = _restore_orbax(path, image_size, backbone)
    if backbone != "auto":
        found = infer_backbone_variant(loaded)
        want = {"small": "small", "large": "large"}.get(backbone, backbone)
        if found != want:
            raise ValueError(
                f"--backbone says {want!r} but {path} holds a {found!r} "
                "checkpoint (distinguished by the cspelan1/cv2_1 block)")
    return loaded


def _restore_orbax(path: str, image_size: Tuple[int, int],
                   backbone: str) -> Dict[str, Any]:
    """Orbax checkpoint directory: saved payload is either bare
    variables or the train-state layout {step, params, batch_stats,
    opt_state}; the template must structurally match, so 'auto' probes
    small then large."""
    import orbax.checkpoint as ocp

    from hgr_tpu.models import MultiTaskNet

    ckptr = ocp.StandardCheckpointer()
    if backbone == "auto":
        meta = read_run_meta(path)
        variants = ("small", "large")
        if meta and meta.get("backbone") in variants:
            # recorded variant first — the other stays as fallback in
            # case the meta is stale/hand-edited
            first = meta["backbone"]
            variants = (first, "large" if first == "small" else "small")
    else:
        variants = (backbone,)
    last_exc: Exception = ValueError("no variant attempted")
    for variant in variants:
        model = MultiTaskNet(image_size=image_size, backbone=variant)
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1,) + tuple(image_size) + (3,)),
                              train=False)
        # try a bare variables payload first, then the train-state layout
        try:
            return ckptr.restore(os.path.abspath(path), template)
        except Exception as exc:
            last_exc = exc
        try:
            from hgr_tpu.train.state import create_train_state

            state, _ = create_train_state(
                model, jax.random.PRNGKey(0),
                (1,) + tuple(image_size) + (3,), lr=1e-3,
                milestones_steps=())
            payload = {
                "step": state.step,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            }
            restored = ckptr.restore(os.path.abspath(path), payload)
            return {"params": restored["params"],
                    "batch_stats": restored["batch_stats"]}
        except Exception as exc:
            last_exc = exc
    raise last_exc


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
