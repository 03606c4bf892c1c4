"""Checkpoint conversion CLI: migrate weights between formats.

Reference users arrive with Lightning ``.ckpt`` files (train.py output)
and YOLOv7-tiny ``.onnx`` detectors (README.md:84). This tool ports both
into hgr_tpu-native bundles:

  python cli/convert.py --classifier best.ckpt --out weights.npz
  python cli/convert.py --detector yolov7-tiny.onnx --out det.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--classifier', type=str, default='',
                        help='reference Lightning .ckpt to convert')
    parser.add_argument('--detector', type=str, default='',
                        help='YOLOv7-tiny .onnx to convert (parsed by the '
                             'first-party ONNX reader — no onnx pkg needed)')
    parser.add_argument('--out', type=str, required=True,
                        help='output .npz path')
    parser.add_argument('--verify', action='store_true',
                        help='run a forward-parity check after porting '
                             '(classifier only; needs torch)')
    args = parser.parse_args()

    from hgr_tpu.infer.export import save_weights_npz

    if args.classifier:
        from hgr_tpu.utils.torch_port import load_reference_checkpoint

        variables = load_reference_checkpoint(args.classifier)
        save_weights_npz(variables, args.out)
        print(f"ported classifier -> {args.out}")

        if args.verify:
            import numpy as np
            import torch

            import jax
            import jax.numpy as jnp

            from hgr_tpu.models import MultiTaskNet

            sys.path.insert(0, "/root/reference")
            from model.multitasknet import MultiTaskNet as TorchNet

            ckpt = torch.load(args.classifier, map_location="cpu")
            sd = {k.replace("model.", "", 1): v
                  for k, v in ckpt["state_dict"].items()}
            tnet = TorchNet(21, 19, [192, 192]).eval()
            tnet.load_state_dict(sd, strict=True)
            x = np.random.RandomState(0).randn(1, 3, 192, 192).astype(
                np.float32)
            with torch.no_grad():
                t_cls, t_hmap, _ = tnet(torch.as_tensor(x))
            model = MultiTaskNet(precision=jax.lax.Precision.HIGHEST)
            j_cls, j_hmap, _ = model.apply(
                variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                train=False)
            err = float(np.abs(np.asarray(j_cls) - t_cls.numpy()).max())
            print(f"forward parity max |d logits| = {err:.2e}")
    elif args.detector:
        from hgr_tpu.utils.onnx_port import port_yolov7_tiny_onnx

        variables = port_yolov7_tiny_onnx(args.detector)
        save_weights_npz(variables, args.out)
        print(f"ported detector -> {args.out}")
    else:
        parser.error("provide --classifier or --detector")


if __name__ == "__main__":
    main()
