"""Inference stack: fused detect->crop->classify graph, video CLI, export."""

from hgr_tpu.infer.detect import HandGesturePipeline  # noqa: F401
