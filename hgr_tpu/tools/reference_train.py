"""Head-to-head harness: train the REFERENCE code itself (torch CPU).

Drives ``/root/reference``'s own modules read-only — ``model/``
(MultiTaskNet), ``libs/load.py`` (HagridDataset/HandDataModule),
``libs/loss.py``, ``libs/metrics.py`` — with the exact ``train.py``
recipe, re-expressed without Lightning because this sandbox has neither
``lightning`` nor ``torchvision``:

* optimizer/schedule: AdamW(lr) + MultiStepLR(milestones, factor)
  (reference train.py:49-56)
* loss: ClassificationLoss*0.001 + JointsMSELoss(target_weight)
  (train.py:63-64)
* seeding: seed_everything(42) equivalent (train.py:21)
* matmul precision "high" (train.py:19)
* checkpoint policy: best by val/total_loss, test runs the best weights
  (train.py:214-221, 240)
* loaders: shuffle train only, default collate, like libs/load.py:280-305

Shims (exact documented semantics, no behavior change):
* ``lightning.pytorch.LightningDataModule`` -> plain base class; the
  reference only subclasses it for the dataloader factory methods.
* ``torchvision.transforms.{Compose,ToTensor,Normalize}`` -> ToTensor is
  HWC uint8 -> CHW float/255 (the dataset always passes the uint8
  warpAffine output, libs/load.py:136-140), Normalize is per-channel
  (x-mean)/std.

Emits one JSONL row per epoch {epoch, train_total_loss, val_total_loss,
val_f1, val_pose_acc, lr, epoch_time_s} plus a final {"test_f1": ...},
the same scalar names hgr_tpu's own MetricLogger uses, so
``headtohead.py`` can compare the two trajectories directly.

This file contains no reference code; it imports the reference.
"""

from __future__ import annotations

import argparse
import copy
import json
import math
import os
import random
import sys
import time
import types

import numpy as np

REFERENCE_DIR = os.environ.get("HGR_REFERENCE_DIR", "/root/reference")


def _install_shims(torch) -> None:
    """Register lightning/torchvision stand-ins iff the real ones are
    absent (they are in this sandbox)."""
    try:  # pragma: no cover - absent here
        import lightning.pytorch  # noqa: F401
    except ImportError:
        lp = types.ModuleType("lightning.pytorch")

        class LightningDataModule:  # reference only subclasses this
            def __init__(self, *a, **k):
                pass

        lp.LightningDataModule = LightningDataModule
        lightning = types.ModuleType("lightning")
        lightning.pytorch = lp
        sys.modules["lightning"] = lightning
        sys.modules["lightning.pytorch"] = lp

    try:  # pragma: no cover - absent here
        import torchvision.transforms  # noqa: F401
    except ImportError:
        tvt = types.ModuleType("torchvision.transforms")

        class Compose:
            def __init__(self, transforms):
                self.transforms = transforms

            def __call__(self, x):
                for t in self.transforms:
                    x = t(x)
                return x

        class ToTensor:
            def __call__(self, pic):
                t = torch.from_numpy(
                    np.ascontiguousarray(pic.transpose(2, 0, 1)))
                if t.dtype == torch.uint8:
                    return t.float().div(255.0)
                return t.float()

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, t):
                return (t - self.mean) / self.std

        tvt.Compose = Compose
        tvt.ToTensor = ToTensor
        tvt.Normalize = Normalize
        tv = types.ModuleType("torchvision")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt


def run_reference_training(
    data_cfg: dict,
    epochs: int,
    batch_size: int,
    lr: float,
    lr_step,
    lr_factor: float,
    sigma: int,
    out_jsonl: str,
    seed: int = 42,
    num_workers: int = 0,
    image_size=(192, 192),
    log_every: int = 0,
) -> dict:
    import torch

    _install_shims(torch)
    # seed_everything(42, workers=True) equivalent (train.py:21)
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
    torch.set_float32_matmul_precision("high")  # train.py:19

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from libs.load import HandDataModule
    from libs.loss import ClassificationLoss, JointsMSELoss
    from libs.metrics import pose_accuracy
    from model.multitasknet import MultiTaskNet
    from sklearn.metrics import f1_score

    dm = HandDataModule(data_cfg, list(image_size), batch_size, sigma,
                        num_workers)
    dm.setup()

    model = MultiTaskNet(data_cfg["num_joints"], data_cfg["num_classes"],
                         list(image_size))
    joints_loss = JointsMSELoss(use_target_weight=True)
    class_loss = ClassificationLoss()
    optimizer = torch.optim.AdamW(model.parameters(), lr)
    scheduler = torch.optim.lr_scheduler.MultiStepLR(
        optimizer, list(lr_step), lr_factor)

    def forward_losses(batch):
        img, label, target, target_weight, _ = batch
        pred_label, heatmap, _ = model(img)
        cls = class_loss(pred_label, label.long()) * 0.001  # train.py:63
        jl = joints_loss(heatmap, target, target_weight)  # train.py:64
        return cls + jl, pred_label, heatmap

    def eval_epoch(loader):
        model.eval()
        loss_sum = n = 0
        preds, trues = [], []
        acc_w = acc_cnt = 0
        with torch.no_grad():
            for batch in loader:
                total, pred_label, heatmap = forward_losses(batch)
                bs = batch[0].shape[0]
                loss_sum += float(total) * bs
                n += bs
                preds.extend(torch.argmax(pred_label, 1).numpy().tolist())
                trues.extend(batch[1].numpy().tolist())
                _, avg_acc, cnt, _ = pose_accuracy(
                    heatmap.numpy(), batch[2].numpy())
                acc_w += avg_acc * cnt
                acc_cnt += cnt
        # epoch-level macro F1 (argument order as train.py:67-69/177;
        # macro-F1 is symmetric in (pred, true))
        f1 = f1_score(preds, trues, average="macro")
        return (loss_sum / max(n, 1), f1,
                acc_w / max(acc_cnt, 1))

    best = (math.inf, None)
    out = open(out_jsonl, "w")
    for epoch in range(epochs):
        t0 = time.time()
        model.train()
        tr_sum = tr_n = 0
        for i, batch in enumerate(dm.train_dataloader()):
            optimizer.zero_grad()
            total, _, _ = forward_losses(batch)
            total.backward()
            optimizer.step()
            bs = batch[0].shape[0]
            tr_sum += float(total.detach()) * bs
            tr_n += bs
            if log_every and i % log_every == 0:
                print(f"  step {i}: loss {float(total.detach()):.4f}",
                      flush=True)
        scheduler.step()

        val_loss, val_f1, val_pose = eval_epoch(dm.val_dataloader())
        if val_loss < best[0]:  # ModelCheckpoint monitor=val/total_loss
            best = (val_loss, copy.deepcopy(model.state_dict()))
        row = {
            "epoch": epoch,
            "train_total_loss": tr_sum / max(tr_n, 1),
            "val_total_loss": val_loss,
            "val_f1": val_f1,
            "val_pose_acc": val_pose,
            "lr": optimizer.param_groups[0]["lr"],
            "epoch_time_s": time.time() - t0,
        }
        out.write(json.dumps(row) + "\n")
        out.flush()
        print(f"[reference] epoch {epoch}: "
              f"train_loss={row['train_total_loss']:.4f} "
              f"val_loss={val_loss:.4f} val_f1={val_f1:.4f} "
              f"val_pose_acc={val_pose:.4f}", flush=True)

    if best[1] is not None:  # trainer.test(module, dm, "best")
        model.load_state_dict(best[1])
    test_loss, test_f1, test_pose = eval_epoch(dm.test_dataloader())
    final = {"test_f1": test_f1, "test_pose_acc": test_pose,
             "test_total_loss": test_loss}
    out.write(json.dumps(final) + "\n")
    out.close()
    print(f"[reference] Test F1 Score: {test_f1:.4f}", flush=True)
    return final


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_config", required=True)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_step", nargs="+", type=int, default=[30])
    p.add_argument("--lr_factor", type=float, default=0.1)
    p.add_argument("--sigma", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--out", default="reference_metrics.jsonl")
    p.add_argument("--log_every", type=int, default=0)
    args = p.parse_args()

    import yaml

    with open(args.data_config) as f:
        data_cfg = yaml.safe_load(f)
    run_reference_training(
        data_cfg, args.epochs, args.batch_size, args.lr, args.lr_step,
        args.lr_factor, args.sigma, args.out, seed=args.seed,
        num_workers=args.num_workers, log_every=args.log_every)


if __name__ == "__main__":
    main()
