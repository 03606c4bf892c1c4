"""Dataset inspection tool (reference display_data.py:17-76).

Iterates the train pipeline exactly as training sees it (device-side
augment included), un-normalizes, overlays joints + per-joint heatmaps.
Interactive cv2 windows when a display is available; otherwise writes a
contact sheet of JPEGs (headless sandboxes).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def display_data(data_config: str, out_dir: str = "",
                 image_size=(192, 192), batch_size: int = 32,
                 sigma: float = 2.0, num_batches: int = 1,
                 interactive: bool = False) -> int:
    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import load_data_config
    from hgr_tpu.data.dataset import read_annotations
    from hgr_tpu.data.loader import BatchLoader
    from hgr_tpu.data.pipeline import apply_augment_batch, draw_augment_params
    from hgr_tpu.ops.resize import upsample_bilinear_align_corners
    from hgr_tpu.utils.draw import draw_bones, draw_joints
    from hgr_tpu.utils.vis import _colormap_jet, _imwrite, _unnormalize

    cfg = load_data_config(data_config)
    idx = read_annotations(os.path.join(cfg.path, cfg.train), cfg.names)
    loader = BatchLoader(idx, batch_size=batch_size, shuffle=True,
                         num_joints=cfg.num_joints, num_workers=4)

    key = jax.random.PRNGKey(0)
    written = 0
    for bi, batch in enumerate(loader):
        if bi >= num_batches:
            break
        batch.pop("valid", None)
        key, sub = jax.random.split(key)
        params = draw_augment_params(
            sub, batch["canvas"].shape[0],
            jnp.asarray(batch["sizes_hw"]), cfg.augments)
        out = apply_augment_batch(
            jnp.asarray(batch["canvas"]),
            jnp.asarray(batch["orig_to_canvas"]),
            jnp.asarray(batch["sizes_hw"]),
            jnp.asarray(batch["joints"]),
            jnp.asarray(batch["joints_vis"]), params,
            image_size=image_size,
            heatmap_size=(image_size[0] // 4, image_size[1] // 4),
            sigma=sigma)

        imgs = _unnormalize(np.asarray(out["image"]))
        # upsample heatmaps to image size (reference display_data.py:45-47
        # uses align_corners=True)
        hm = np.asarray(upsample_bilinear_align_corners(
            jnp.transpose(out["target"], (0, 2, 3, 1)), 4))

        for j in range(imgs.shape[0]):
            img = np.clip(imgs[j] * 255, 0, 255).astype(np.uint8).copy()
            lm = np.asarray(out["joints"][j]).astype(np.int32)
            img = draw_bones(img, lm)
            img = draw_joints(img, lm)
            # blend the max-over-joints heatmap
            joint_map = hm[j].max(axis=-1)
            heat = _colormap_jet(
                np.clip(joint_map * 255, 0, 255).astype(np.uint8))
            display = (img * 0.8 + heat * 0.2).astype(np.uint8)
            if interactive:
                import cv2

                cv2.imshow("img", display)
                if cv2.waitKey(0) == ord("q"):
                    return written
            else:
                os.makedirs(out_dir or "display_out", exist_ok=True)
                _imwrite(os.path.join(out_dir or "display_out",
                                      f"sample_{bi}_{j}.jpg"), display)
                written += 1
    return written


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_config', type=str,
                        default='configs/hagrid.yaml')
    parser.add_argument('--out_dir', type=str, default='display_out')
    parser.add_argument('--batch_size', type=int, default=32)
    parser.add_argument('--num_batches', type=int, default=1)
    parser.add_argument('--interactive', action='store_true')
    args = parser.parse_args()
    n = display_data(args.data_config, args.out_dir,
                     batch_size=args.batch_size,
                     num_batches=args.num_batches,
                     interactive=args.interactive)
    print(f"wrote {n} inspection images to {args.out_dir}")


if __name__ == "__main__":
    main()
