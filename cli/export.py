"""Export CLI — flag surface mirrors the reference (export.py:49-57):
convert a checkpoint to a deployable artifact, then re-evaluate the test
set through the DESERIALIZED artifact (macro F1 + mean latency).

Example:
  python cli/export.py --data_config configs/hagrid.yaml \
      --weight_path output/run/weight/best --out model.stablehlo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_config', type=str, required=True)
    parser.add_argument('--image_size', nargs='+', type=int, default=None,
                        help='crop geometry; default: the checkpoint\'s '
                             'recorded run_meta.json, else 192 192')
    parser.add_argument('--weight_path', type=str, required=True,
                        help='orbax ckpt dir, .npz, or reference .ckpt')
    parser.add_argument('--out', type=str, default='',
                        help='output artifact path (default: '
                             '<weight_path>.stablehlo)')
    parser.add_argument('--batch', type=int, default=1)
    parser.add_argument('--backbone', choices=['auto', 'gelans', 'gelanl'],
                        default='auto',
                        help='GELAN variant of the checkpoint; auto '
                             'detects it from the weight tree (the two '
                             'variants share channel widths and differ '
                             'only in blocks-per-chain, so a mismatch '
                             'would export silently wrong numbers)')
    parser.add_argument('--skip_eval', action='store_true')
    parser.add_argument('--canvas_size', type=int, default=256)
    parser.add_argument('--host_device_count', type=int, default=0,
                        metavar='N',
                        help='run on N virtual CPU devices instead of '
                             'the TPU (tests/CI; same flag as '
                             'cli/train.py)')
    parser.add_argument('--format', choices=['stablehlo', 'onnx'],
                        default='stablehlo',
                        help='artifact format: stablehlo (native; eval '
                             'runs through the deserialized artifact) or '
                             'onnx (reference-compatible 2-output file '
                             'via torch.onnx.export, reference '
                             'export.py:72-78; eval runs through the '
                             'traced torch mirror — no onnxruntime here)')
    args = parser.parse_args()

    from hgr_tpu.utils.platform import force_host_cpu

    force_host_cpu(args.host_device_count)

    from hgr_tpu.config import load_data_config
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from hgr_tpu.data.dataset import read_annotations
    from hgr_tpu.data.loader import BatchLoader
    from hgr_tpu.infer.export import (
        eval_exported,
        export_stablehlo,
        load_stablehlo,
        save_weights_npz,
    )
    from hgr_tpu.infer.weights import (
        infer_backbone_variant,
        load_classifier_weights,
        resolve_image_size,
    )
    from hgr_tpu.models import MultiTaskNet

    data_cfg = load_data_config(args.data_config)
    image_size = resolve_image_size(args.weight_path, args.image_size)
    backbone = {'auto': 'auto', 'gelans': 'small',
                'gelanl': 'large'}[args.backbone]
    variables = load_classifier_weights(args.weight_path, image_size,
                                        backbone=backbone)
    backbone = infer_backbone_variant(variables)
    model = MultiTaskNet(image_size=image_size, backbone=backbone)

    if args.format == 'onnx':
        import numpy as np

        from hgr_tpu.infer.onnx_export import export_onnx

        out = args.out or (args.weight_path.rstrip('/') + '.onnx')
        mirror = export_onnx(
            variables, out,
            num_joints=data_cfg.num_joints,
            num_classes=data_cfg.num_classes,
            image_size=image_size, batch=args.batch,
            backbone=backbone)
        print(f"exported ONNX artifact -> {out}")
        if not args.skip_eval:
            import torch

            def fn(images):
                x = np.asarray(images).transpose(0, 3, 1, 2)
                with torch.no_grad():
                    logits, hmap = mirror(torch.from_numpy(x))
                return np.asarray(logits), np.asarray(hmap)

            idx = read_annotations(
                os.path.join(data_cfg.path, data_cfg.test), data_cfg.names)
            loader = BatchLoader(
                idx, batch_size=args.batch, canvas_size=args.canvas_size,
                num_joints=data_cfg.num_joints, shuffle=False,
                drop_last=False, num_workers=4)
            print("Testing the traced torch mirror on the test split "
                  "(the module torch.onnx.export serialized; no "
                  "onnxruntime in this environment)...")
            res = eval_exported(fn, loader, data_cfg.num_classes,
                                image_size=image_size)
            print("Test F1 Score: {:.4f}".format(res["test_f1"]))
        return

    out = args.out or (args.weight_path.rstrip('/') + '.stablehlo')
    export_stablehlo(model, variables, out, batch=args.batch)
    save_weights_npz(variables, out + '.weights.npz')
    print(f"exported StableHLO artifact -> {out}")
    print(f"weights bundle -> {out}.weights.npz")

    if not args.skip_eval:
        fn = load_stablehlo(out)
        idx = read_annotations(
            os.path.join(data_cfg.path, data_cfg.test), data_cfg.names)
        loader = BatchLoader(
            idx, batch_size=args.batch, canvas_size=args.canvas_size,
            num_joints=data_cfg.num_joints, shuffle=False, drop_last=False,
            num_workers=4)
        print("Testing the exported model on the test split...")
        res = eval_exported(fn, loader, data_cfg.num_classes,
                            image_size=image_size)
        print("Test F1 Score: {:.4f}".format(res["test_f1"]))
        print("Average time taken to process one image: {:.4f} seconds"
              .format(res["mean_latency_s"]))


if __name__ == "__main__":
    main()
