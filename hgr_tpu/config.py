"""Configuration dataclasses + YAML loading.

Mirrors the reference's config surface: the YAML data config
(reference configs/hagrid.yaml:1-39) and the train-time argparse flags
(reference train.py:244-283), expressed as typed dataclasses so every
downstream component is jit-/static-shape friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Stochastic augmentation factors (reference configs/hagrid.yaml:33-39,
    consumed at libs/load.py:40-45,116-133)."""

    rotate_factor: float = 20.0
    scale_factor: float = 0.35
    translate_factor: float = 0.02
    horizontal_flip: bool = True
    color_jittering: bool = True
    # HSV jitter gains (reference libs/augmentations.py:22 defaults).
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset description (reference configs/hagrid.yaml)."""

    path: str = "data/hagrid_small"
    train: str = "annotations/train"
    val: str = "annotations/val"
    test: str = "annotations/test"
    num_joints: int = 21
    num_classes: int = 19
    names: Dict[str, int] = dataclasses.field(default_factory=dict)
    augments: AugmentConfig = dataclasses.field(default_factory=AugmentConfig)

    @property
    def id_to_name(self) -> Dict[int, str]:
        return {v: k for k, v in self.names.items()}


# The 19 HaGRID gesture classes (reference configs/hagrid.yaml:11-31).
DEFAULT_NAMES: Dict[str, int] = {
    "call": 0, "dislike": 1, "fist": 2, "four": 3, "like": 4, "mute": 5,
    "ok": 6, "one": 7, "palm": 8, "peace": 9, "peace_inverted": 10,
    "rock": 11, "stop": 12, "stop_inverted": 13, "three": 14, "three2": 15,
    "two_up": 16, "two_up_inverted": 17, "no_gesture": 18,
}


def load_data_config(path: str) -> DataConfig:
    """Load a reference-format YAML data config (configs/hagrid.yaml)."""
    with open(path, "r") as stream:
        raw = yaml.safe_load(stream)
    aug_raw = raw.get("augments", {}) or {}
    augments = AugmentConfig(
        rotate_factor=float(aug_raw.get("rotate_factor", 0.0)),
        scale_factor=float(aug_raw.get("scale_factor", 0.0)),
        translate_factor=float(aug_raw.get("translate_factor", 0.0)),
        horizontal_flip=bool(aug_raw.get("horizontal_flip", False)),
        color_jittering=bool(aug_raw.get("color_jittering", False)),
    )
    return DataConfig(
        path=raw.get("path", ""),
        train=raw.get("train", ""),
        val=raw.get("val", ""),
        test=raw.get("test", ""),
        num_joints=int(raw["num_joints"]),
        num_classes=int(raw["num_classes"]),
        names=dict(raw.get("names", DEFAULT_NAMES)),
        augments=augments,
    )


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """MultiTaskNet hyper-parameters (reference model/multitasknet.py:9-22)."""

    num_joints: int = 21
    num_classes: int = 19
    image_size: Tuple[int, int] = (192, 192)  # (H, W)
    backbone: str = "small"  # GELAN variant: 'small' | 'large'
    dim: int = 256
    depth: int = 4
    heads: int = 8
    head_dim: int = 32
    mlp_dim: int = 256
    # TPU knobs (no reference equivalent — compute dtype selection).
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # Decoder (1x1 proj + ViT) compute dtype override; None = follow
    # compute_dtype. 'float32' under a bf16 backbone is the mixed
    # training recipe: the classification gradient (CE x 0.001,
    # reference train.py:63) is ~2^-10 of the pose-dominated cotangent
    # magnitudes, so a bf16 decoder backward rounds it into its own
    # quantization noise — measured as a reproducible ~0.03 macro-F1
    # deficit vs the f32 reference (BENCH_LOG round 4). The decoder is
    # <10% of step FLOPs, so f32 there restores the cls gradient SNR
    # at near-bf16 speed.
    decoder_dtype: Optional[str] = None
    # Backbone precision scheduling (gelan.GELANNet.early_dtype): run
    # the first early_units GELAN units in early_dtype. float32 early
    # units under a bf16 body preserve the fine-grained color-scale
    # class cues that uniform bf16 quantizes away (round-4 bisection:
    # the F1 deficit vs the f32 reference lives in the backbone, not
    # the decoder — BENCH_LOG round 4).
    early_dtype: Optional[str] = None
    early_units: int = 3
    # Fused Pallas attention routing (vit.Attention.fused): True = packed
    # kernel (single-device / data-parallel); 'split' = head-sharded
    # kernel for tensor-parallel meshes (heads must divide the model
    # axis); False = unfused XLA chain.
    fused_attention: Any = True
    # Rematerialize the backbone body and the pose head in the backward
    # pass (models/gelan.py GELANNet.remat, models/vit.py
    # ViT.remat_pose_head): ~8 GB less live HBM at B=1024 for one extra
    # backbone forward (~15% of step FLOPs). Enable when a big batch
    # must share the chip with an HBM dataset cache.
    remat: bool = False

    @property
    def feature_size(self) -> Tuple[int, int]:
        return (self.image_size[0] // 16, self.image_size[1] // 16)

    @property
    def heatmap_size(self) -> Tuple[int, int]:
        return (self.image_size[0] // 4, self.image_size[1] // 4)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training recipe (reference train.py:244-283 defaults + README.md:62-71)."""

    batch_size: int = 32
    epochs: int = 50
    lr: float = 1e-3
    lr_step: Tuple[int, ...] = (30, 40)
    lr_factor: float = 0.1
    sigma: float = 2.0
    seed: int = 42
    class_loss_weight: float = 0.001  # reference train.py:63
    num_workers: int = 8
    log_dir: str = "logs"
    save_dir: str = "output"
    # TPU-native extensions.
    mesh_shape: Optional[Dict[str, int]] = None  # e.g. {'data': 8}
    steps_per_epoch: Optional[int] = None
    canvas_size: int = 256  # host->device image staging canvas (square)
    debug_every: int = 100  # debug image dump cadence (reference train.py:149)
    # Sequential microbatches per optimizer step (train/steps.py): one
    # exactly-combined update, single-microbatch peak activation memory.
    grad_accum: int = 1
    # De-mixed task-gradient pullbacks under bf16 compute
    # (train/steps.make_train_step grad_demix): exact multi-task
    # gradients at one extra backward pass. 'auto' = on iff the model
    # computes in bf16 (where the merged cotangent stream drowns the
    # CE-x-0.001 classification gradient), off for f32.
    grad_demix: str = "auto"  # 'auto' | 'on' | 'off' | 'batched'


# ImageNet normalization constants applied to (BGR-ordered!) images —
# the reference normalizes BGR data with RGB-ordered stats
# (libs/load.py:46-50 after cv2.imread BGR at load.py:54); we preserve
# that behavior behind a flag for weight parity.
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)
