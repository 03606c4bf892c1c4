"""Migration-surface test: drive the ACTUAL CLI entry points, as
subprocesses, with the reference's own flag names (reference
train.py:244-283, export.py:49-57, detect.py:210-231 — the command map
in MIGRATION.md). The library-level workflow is covered by
test_e2e_workflow.py; this module pins the argparse surfaces and the
process-level wiring (config loading, output layout, artifact paths)
that a migrating reference user actually touches.

One chained test covers train -> export -> detect so the synthetic
fixture and the subprocess compile cache are amortized.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(script, args, timeout=900):
    env = dict(os.environ)
    # PREPEND the repo root: the axon backend plugin resolves via the
    # existing PYTHONPATH, so it must be extended, never replaced.
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", script)] + args,
        capture_output=True, text=True, timeout=timeout, env=env)
    assert proc.returncode == 0, (
        f"{script} {' '.join(args)} failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}")
    return proc.stdout


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """Synthetic dataset (reference annotation layout) + a data config
    in the reference's own YAML schema."""
    from hgr_tpu.data.synthetic import write_synthetic_split

    root = tmp_path_factory.mktemp("cli_surface")
    data = str(root / "data")
    for split, n in (("train", 8), ("val", 4), ("test", 4)):
        write_synthetic_split(data, split, n, image_size=96, seed=7)

    names = "\n".join(
        f"  {k}: {v}" for k, v in (
            ("call", 0), ("dislike", 1), ("fist", 2), ("four", 3),
            ("like", 4), ("mute", 5), ("ok", 6), ("one", 7), ("palm", 8),
            ("peace", 9), ("peace_inverted", 10), ("rock", 11),
            ("stop", 12), ("stop_inverted", 13), ("three", 14),
            ("three2", 15), ("two_up", 16), ("two_up_inverted", 17),
            ("no_gesture", 18)))
    cfg = root / "data.yaml"
    cfg.write_text(
        f"path: {data}\n"
        "train: annotations/train\n"
        "val: annotations/val\n"
        "test: annotations/test\n"
        "num_joints: 21\n"
        "num_classes: 19\n"
        f"names:\n{names}\n"
        "augments:\n"
        "  rotate_factor: 20\n"
        "  scale_factor: 0.35\n"
        "  translate_factor: 0.02\n"
        "  horizontal_flip: true\n"
        "  color_jittering: true\n")
    return root


def test_train_export_detect_surface(fixture_dir):
    root = fixture_dir
    cfg = str(root / "data.yaml")
    save_dir = str(root / "output")
    log_dir = str(root / "logs")

    # --- train: the reference README invocation, tiny sizes ---
    _run_cli("train.py", [
        "--data_config", cfg, "--suffix", "clitest",
        "--batch_size", "4", "--num_workers", "1",
        "--epochs", "1", "--lr", "0.0001", "--lr_step", "30",
        "--image_size", "64", "64",
        "--save_dir", save_dir, "--log_dir", log_dir,
        "--dtype", "float32", "--host_device_count", "1"])

    run_dir = os.path.join(save_dir, "gelans_64x64_clitest")
    weight_dir = os.path.join(run_dir, "weight")
    assert os.path.isdir(os.path.join(weight_dir, "best"))
    assert os.path.isdir(os.path.join(weight_dir, "last"))
    # fit() records what the checkpoints ARE (train/loop.py); inference
    # CLIs default their geometry/backbone from this
    meta = json.load(open(os.path.join(weight_dir, "run_meta.json")))
    assert meta["backbone"] == "small"
    assert meta["image_size"] == [64, 64]

    from hgr_tpu.infer.weights import read_run_meta, resolve_image_size

    ckpt_best = os.path.join(weight_dir, "best")
    assert read_run_meta(ckpt_best)["image_size"] == [64, 64]
    assert resolve_image_size(ckpt_best, None) == (64, 64)
    assert resolve_image_size(ckpt_best, [96, 96]) == (96, 96)  # flag wins
    metrics_file = os.path.join(log_dir, "gelans_64x64_clitest",
                                "metrics.jsonl")
    assert os.path.isfile(metrics_file)
    rows = [json.loads(l) for l in open(metrics_file)]
    assert rows and any("loss" in k or "f1" in k
                        for r in rows for k in r)

    # --- export: reference flag surface; eval through the artifact ---
    art = str(root / "model.stablehlo")
    out = _run_cli("export.py", [
        "--data_config", cfg, "--image_size", "64", "64",
        "--weight_path", os.path.join(weight_dir, "best"),
        "--out", art, "--batch", "4",
        "--host_device_count", "1"])
    assert os.path.exists(art), out

    # --- detect: image-dir input -> mp4, reference flags. No
    # --cls_img_size: the CLI must resolve 64x64 from run_meta.json (a
    # wrong 192 fallback cannot restore the 64x64 orbax checkpoint, so
    # the subprocess succeeding proves the resolution path). ---
    import cv2

    frames = root / "frames"
    frames.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(str(frames / f"f{i:03d}.png"),
                    rng.randint(0, 255, (120, 160, 3), np.uint8))
    result = str(root / "result.mp4")
    out = _run_cli("detect.py", [
        "--data_config", cfg,
        "--cls_weight", os.path.join(weight_dir, "best"),
        "--data_path", str(frames), "--save_path", result,
        "--det_img_size", "160",
        "--score_thresh", "-1", "--dtype", "float32",
        "--host_device_count", "1"])
    assert "processed 3 frames" in out
    assert os.path.isfile(result) and os.path.getsize(result) > 0


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_convert_cli_roundtrip(tmp_path):
    """cli/convert.py: a reference Lightning .ckpt (``model.``-prefixed
    state dict, reference export.py:34-40) converts to npz
    (MIGRATION.md artifact-compatibility row)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from model.multitasknet import MultiTaskNet as TorchNet
    finally:
        sys.path.remove("/root/reference")

    torch.manual_seed(0)
    tnet = TorchNet(21, 19, [192, 192]).eval()
    ckpt = tmp_path / "ref.ckpt"
    torch.save({"state_dict": {f"model.{k}": v
                               for k, v in tnet.state_dict().items()}},
               str(ckpt))

    out = tmp_path / "w.npz"
    _run_cli("convert.py", ["--classifier", str(ckpt), "--out", str(out)],
             timeout=600)
    assert out.exists()


def test_train_cli_plumbs_every_train_flag():
    """Every TrainConfig-backed CLI flag must actually reach TrainConfig
    — regression for the round-4 bug where --grad_demix parsed but never
    left argparse (the sweep silently ran the plain step). Parse the
    TrainConfig(...) call in cli/train.py and require one kwarg per
    tracked flag."""
    import re

    src = open(os.path.join(REPO, "cli", "train.py")).read()
    m = re.search(r"train_cfg = TrainConfig\((.*?)\n    \)", src, re.S)
    assert m, "TrainConfig construction not found"
    body = m.group(1)
    for flag in ("batch_size", "epochs", "lr", "lr_step", "lr_factor",
                 "sigma", "seed", "class_loss_weight", "num_workers",
                 "canvas_size", "grad_accum", "grad_demix"):
        assert re.search(rf"{flag}\s*=", body), (
            f"--{flag} parsed but not passed into TrainConfig")


def test_train_cli_grad_demix_choices_match_resolver():
    """The CLI's --grad_demix choices and the resolver's accepted modes
    must stay in lockstep (round-5 added 'batched')."""
    import re

    src = open(os.path.join(REPO, "cli", "train.py")).read()
    m = re.search(r"--grad_demix'.*?choices=\[(.*?)\]", src, re.S)
    assert m, "--grad_demix choices not found"
    cli_choices = set(re.findall(r"'(\w+)'", m.group(1)))
    assert cli_choices == {"auto", "on", "off", "batched"}

    from hgr_tpu.config import ModelConfig, TrainConfig
    from hgr_tpu.train.steps import resolve_grad_demix

    for mode in cli_choices:
        resolved = resolve_grad_demix(TrainConfig(grad_demix=mode),
                                      ModelConfig())
        assert resolved in (True, False, "batched"), (mode, resolved)
