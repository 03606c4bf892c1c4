"""Video/image-dir inference CLI — flag surface mirrors the reference
(detect.py:210-249).

Example:
  python cli/detect.py --data_config configs/hagrid.yaml \
      --cls_weight output/run/weight/best --det_weight detector.npz \
      --data_path data/test.mov --save_path result.mp4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_config', type=str, required=True)
    parser.add_argument('--cls_weight', type=str, default='',
                        help='classifier weights: orbax ckpt dir, .npz, or '
                             'reference .ckpt (torch)')
    parser.add_argument('--det_weight', type=str, default='',
                        help='detector weights: .npz (flax paths) or .onnx '
                             '(requires onnx package)')
    parser.add_argument('--data_path', type=str, default='data/test.mov')
    parser.add_argument('--save_path', type=str, default='result.mp4')
    parser.add_argument('--det_img_size', type=int, default=416)
    parser.add_argument('--cls_img_size', nargs='+', type=int,
                        default=None,
                        help='classifier crop geometry; default: the '
                             "checkpoint's recorded run_meta.json, "
                             'else 192 192')
    parser.add_argument('--score_thresh', type=float, default=0.2)
    parser.add_argument('--dtype', type=str, default='bfloat16',
                        choices=['bfloat16', 'float32'])
    parser.add_argument('--batch_frames', type=int, default=1,
                        help='batch N frames per device call (offline '
                             'throughput mode)')
    parser.add_argument('--pipeline_depth', type=int, default=3,
                        help='frame batches kept in flight on the device '
                             'while host decode/annotate/encode runs '
                             '(infer/detect.detect_to_video)')
    parser.add_argument('--host_device_count', type=int, default=0,
                        metavar='N',
                        help='run on N virtual CPU devices instead of '
                             'the TPU (tests/CI; same flag as '
                             'cli/train.py)')
    parser.add_argument('--show', action='store_true',
                        help='interactive preview window (reference '
                             "detect.py behavior; 'q' quits)")
    args = parser.parse_args()

    from hgr_tpu.utils.platform import force_host_cpu

    force_host_cpu(args.host_device_count)

    import jax.numpy as jnp

    from hgr_tpu.config import load_data_config
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from hgr_tpu.infer.detect import HandGesturePipeline, detect_to_video
    from hgr_tpu.infer.weights import (
        load_classifier_weights,
        load_detector_weights,
        resolve_image_size,
    )

    data_cfg = load_data_config(args.data_config)
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32

    cls_img_size = resolve_image_size(args.cls_weight, args.cls_img_size)
    cls_vars = load_classifier_weights(
        args.cls_weight, image_size=cls_img_size)
    det_vars = load_detector_weights(args.det_weight,
                                     det_img_size=args.det_img_size)

    pipeline = HandGesturePipeline(
        cls_vars, det_vars, data_cfg.names,
        det_img_size=args.det_img_size,
        cls_img_size=cls_img_size,
        score_thresh=args.score_thresh, dtype=dtype)

    n = detect_to_video(pipeline, args.data_path, args.save_path,
                        batch_frames=args.batch_frames, show=args.show,
                        pipeline_depth=args.pipeline_depth)
    print(f"processed {n} frames -> {args.save_path}")


if __name__ == "__main__":
    main()
