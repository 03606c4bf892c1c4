"""Flax model zoo: GELAN backbone, ViT decoder, MultiTaskNet, YOLO detector."""

from hgr_tpu.models.layers import ConvBnAct, ResBasicBlock, ResBottleneck  # noqa: F401
from hgr_tpu.models.gelan import GELANBlock, GELANNet  # noqa: F401
from hgr_tpu.models.vit import ViT, Transformer  # noqa: F401
from hgr_tpu.models.multitasknet import MultiTaskNet  # noqa: F401
