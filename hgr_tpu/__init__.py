"""hgr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) hand-gesture recognition framework.

Re-implements, TPU-first, the full capability surface of the reference
PyTorch/Lightning repo (yingkunwu/hand-gesture-recognition): a multi-task
network (19-class gesture classification + 21-keypoint hand-pose heatmaps)
trained on HaGRID crops, a two-stage detect->crop->classify video inference
pipeline, dataset extraction/inspection tooling, and export.

Design principles (see README.md):
  * NHWC layouts, bfloat16 compute, static shapes — everything jit-compiled.
  * Geometry / augmentation / target-generation run ON DEVICE, batched,
    fused into the train step (reference does them per-sample on CPU workers
    via OpenCV: libs/load.py, libs/transforms.py, libs/augmentations.py).
  * Scaling via jax.sharding.Mesh + NamedSharding (data-parallel by default,
    optional tensor-parallel ViT) — the reference is single-GPU (train.py:228).
  * Pallas kernels for the fused attention hot path; XLA for convs (MXU).
"""

__version__ = "0.1.0"

from hgr_tpu.config import DataConfig, TrainConfig, load_data_config  # noqa: F401
