"""Multi-host data parallelism (hgr_tpu/parallel/distributed.py).

The reference is single-GPU torch with no distributed backend
(reference train.py:228-240), so there is nothing to port — this pins
the TPU-native scaling story instead: N host processes, each feeding
its row-slice of every global batch into one global-mesh train step,
must train IDENTICALLY to a single process at the same global batch
size.

Two layers:
  * loader slicing (pure host, fast): per-process BatchLoader slices
    concatenate to exactly the single-process batch, every epoch,
    including the padded tail;
  * the real thing: two `cli/train.py --distributed` processes on a
    virtual 2-host x 4-device CPU topology (gloo collectives) vs one
    process on 8 devices — same fixture, same recipe, same seed —
    compared on the logged val-loss trajectory and test F1.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# Loader slicing (host-only, no distributed runtime)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from hgr_tpu.data.synthetic import write_synthetic_split

    root = tmp_path_factory.mktemp("distributed")
    data = str(root / "data")
    for split, n in (("train", 24), ("val", 8), ("test", 8)):
        write_synthetic_split(data, split, n, image_size=96, seed=11)
    return root


def _loader(split_dir, bs, shuffle, **kw):
    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.data.dataset import read_annotations
    from hgr_tpu.data.loader import BatchLoader

    idx = read_annotations(split_dir, DEFAULT_NAMES)
    return BatchLoader(idx, batch_size=bs, canvas_size=128,
                       shuffle=shuffle, seed=3, drop_last=False,
                       num_workers=2, **kw)


@pytest.mark.parametrize("shuffle", [False, True])
def test_loader_process_slices_concat_to_global(fixture_dir, shuffle):
    split = str(fixture_dir / "data" / "annotations" / "train")
    bs, nproc = 16, 4
    full = _loader(split, bs, shuffle)
    parts = [_loader(split, bs, shuffle,
                     process_count=nproc, process_index=i)
             for i in range(nproc)]
    # Two epochs: the shuffle permutation advances with the loader's
    # internal epoch counter, which must stay in lockstep everywhere.
    for _ in range(2):
        full_batches = list(full)
        part_batches = [list(p) for p in parts]
        assert all(len(pb) == len(full_batches) for pb in part_batches)
        for b_i, fb in enumerate(full_batches):
            for key in fb:
                got = np.concatenate(
                    [part_batches[p][b_i][key] for p in range(nproc)])
                np.testing.assert_array_equal(
                    got, fb[key],
                    err_msg=f"batch {b_i} key {key} (shuffle={shuffle})")


def test_loader_process_args_validated(fixture_dir):
    split = str(fixture_dir / "data" / "annotations" / "train")
    with pytest.raises(ValueError):
        _loader(split, 10, False, process_count=4, process_index=0)
    with pytest.raises(ValueError):
        _loader(split, 16, False, process_count=4, process_index=4)


def test_parse_spec():
    from hgr_tpu.parallel.distributed import parse_spec

    assert parse_spec("10.0.0.1:9999,4,2") == ("10.0.0.1:9999", 4, 2)
    with pytest.raises(ValueError):
        parse_spec("10.0.0.1:9999,4")
    with pytest.raises(ValueError):
        parse_spec("h:1,2,2")


# ---------------------------------------------------------------------------
# End-to-end: 2 processes x 4 devices == 1 process x 8 devices
# ---------------------------------------------------------------------------

def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_yaml(root):
    from hgr_tpu.config import DEFAULT_NAMES

    names = "\n".join(f"  {k}: {v}" for k, v in DEFAULT_NAMES.items())
    cfg = root / "data.yaml"
    cfg.write_text(
        f"path: {root / 'data'}\n"
        "train: annotations/train\nval: annotations/val\n"
        "test: annotations/test\nnum_joints: 21\nnum_classes: 19\n"
        f"names:\n{names}\n"
        "augments:\n  rotate_factor: 20\n  scale_factor: 0.35\n"
        "  translate_factor: 0.02\n  horizontal_flip: true\n"
        "  color_jittering: true\n")
    return str(cfg)


def _train_cmd(cfg, save_dir, log_dir, suffix, extra):
    return [sys.executable, os.path.join(REPO, "cli", "train.py"),
            "--data_config", cfg, "--suffix", suffix,
            "--batch_size", "16", "--epochs", "2", "--lr", "1e-3",
            "--image_size", "64", "64", "--num_workers", "2",
            "--seed", "5", "--dtype", "float32",
            "--save_dir", save_dir, "--log_dir", log_dir] + extra


def _final_metrics(log_dir, run_name):
    path = os.path.join(log_dir, run_name, "metrics.jsonl")
    val_losses, test_f1 = [], None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "val/total_loss" in rec:
                val_losses.append(rec["val/total_loss"])
            if "test/epoch_f1" in rec:
                test_f1 = rec["test/epoch_f1"]
    return val_losses, test_f1


def test_two_process_training_matches_single_process(fixture_dir):
    cfg = _write_yaml(fixture_dir)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Lockstep SPMD requires both processes to run the IDENTICAL
    # compiled program; a persistent cache where one process hits a
    # stale entry and the other compiles fresh can desynchronize the
    # collective schedule. Fresh deterministic compiles in every worker.
    env["HGR_TPU_NO_CACHE"] = "1"

    # --- single process, 8 virtual devices, data=8 ---
    sp_save = str(fixture_dir / "out_sp")
    sp_logs = str(fixture_dir / "logs_sp")
    proc = subprocess.run(
        _train_cmd(cfg, sp_save, sp_logs, "sp",
                   ["--host_device_count", "8", "--mesh", "data=8"]),
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, (
        f"single-process run failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}")

    # --- two processes, 4 virtual devices each, global data=8 ---
    dp_save = str(fixture_dir / "out_dp")
    dp_logs = str(fixture_dir / "logs_dp")
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            _train_cmd(cfg, dp_save, dp_logs, "dp",
                       ["--host_device_count", "4", "--mesh", "data=8",
                        "--distributed", f"127.0.0.1:{port},2,{pid}"]),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (f"distributed worker failed rc={rc}\n"
                         f"stdout:\n{out[-3000:]}\nstderr:\n{err[-3000:]}")

    # Only the coordinator logs/prints/checkpoints.
    assert "Test F1 Score" in outs[0][1]
    assert "Test F1 Score" not in outs[1][1]
    run_sp = "gelans_64x64_sp"
    run_dp = "gelans_64x64_dp"
    assert os.path.isdir(os.path.join(dp_save, run_dp, "weight", "last"))

    sp_val, sp_f1 = _final_metrics(sp_logs, run_sp)
    dp_val, dp_f1 = _final_metrics(dp_logs, run_dp)
    assert sp_val and dp_val and len(sp_val) == len(dp_val)
    # Same global batches, same seed, same step count: the trajectories
    # agree to collective-reduction-order noise (gloo tree-reduce vs
    # single-process XLA reduce on f32).
    np.testing.assert_allclose(dp_val, sp_val, rtol=2e-4, atol=2e-5)
    assert sp_f1 is not None and dp_f1 is not None
    assert abs(sp_f1 - dp_f1) < 1e-6

    # --- resume: all processes restore the shared 'last' checkpoint
    # (orbax restore is a collective; best_metric seeding broadcasts
    # from the coordinator) and train one more epoch.
    port = _free_port()
    procs = []
    for pid in range(2):
        cmd = _train_cmd(cfg, dp_save, dp_logs, "dp",
                         ["--host_device_count", "4", "--mesh", "data=8",
                          "--distributed", f"127.0.0.1:{port},2,{pid}",
                          "--resume"])
        cmd[cmd.index("--epochs") + 1] = "1"
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env))
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (
            f"distributed resume failed rc={p.returncode}\n"
            f"stdout:\n{out[-3000:]}\nstderr:\n{err[-3000:]}")
        if p is procs[0]:
            assert "resumed from step" in out
