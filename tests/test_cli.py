"""CLI smoke tests: the training and KD entry points run end-to-end on
synthetic data (tiny model, one/two epochs), covering arg parsing, the
epoch loop, checkpointing, resume, eval mode, and the launcher."""

import argparse
import os

import pytest


BASE = ["--model", "SLaK_debug", "--Decom", "true",
        "--kernel_size", "13", "11", "9", "7", "5",
        "--data_set", "synthetic", "--synthetic_len", "32",
        "--input_size", "32", "--batch_size", "8",
        "--epochs", "1", "--warmup_epochs", "0",
        "--use_bf16", "false", "--nb_classes", "10",
        "--num_workers", "2", "--drop_path", "0.0", "--n_devices", "1"]


def test_train_cli_sparse_roundtrip(tmp_path):
    from slak_tpu.train.main import get_args_parser, main
    p = argparse.ArgumentParser(parents=[get_args_parser()])
    out = str(tmp_path / "run")
    args = p.parse_args(BASE + ["--sparse", "--sparse_init", "snip",
                                "-u", "2", "--model_ema", "true",
                                "--output_dir", out])
    main(args)
    assert os.path.exists(os.path.join(out, "checkpoint-0"))
    assert os.path.exists(os.path.join(out, "log.txt"))

    # resume + continue one more epoch
    args2 = p.parse_args(BASE + ["--sparse", "--sparse_init", "snip",
                                 "-u", "2", "--model_ema", "true",
                                 "--epochs", "2", "--output_dir", out])
    main(args2)
    # eval-only from the checkpoint
    stats = main(p.parse_args(BASE + ["--sparse", "--sparse_init", "snip",
                                      "--output_dir", out,
                                      "--eval", "true"]))
    assert 0.0 <= stats["acc1"] <= 1.0


def test_train_cli_flag_surface(tmp_path):
    """Reference flag-parity additions in one run: inception mean/std,
    const-mode erasing, cutmix_minmax boxes, random train interpolation,
    --disable_eval (no per-epoch val pass), --start_epoch override,
    --verbose sparsity report."""
    from slak_tpu.train.main import get_args_parser, main
    p = argparse.ArgumentParser(parents=[get_args_parser()])
    res = main(p.parse_args(BASE + [
        "--imagenet_default_mean_and_std", "false",
        "--remode", "const", "--cutmix_minmax", "0.2", "0.8",
        "--train_interpolation", "random",
        "--disable_eval", "true", "--start_epoch", "0", "--verbose",
        "--sparse", "--sparse_init", "uniform", "-u", "2",
        "--output_dir", str(tmp_path / "run")]))
    assert "max_accuracy" in res


def test_train_cli_adan(tmp_path):
    """--opt adan end-to-end through the CLI (parser -> TrainConfig ->
    adan_init/adan_update in the jitted step), with checkpoint save."""
    from slak_tpu.train.main import get_args_parser, main
    p = argparse.ArgumentParser(parents=[get_args_parser()])
    out = str(tmp_path / "run")
    main(p.parse_args(BASE + ["--opt", "adan", "--opt_betas",
                              "0.98", "0.92", "0.99",
                              "--clip_grad", "5.0", "--output_dir", out]))
    assert os.path.exists(os.path.join(out, "checkpoint-0"))


def test_kd_cli_smoke(tmp_path):
    from slak_tpu.kd.main import get_kd_args_parser, main
    p = argparse.ArgumentParser(parents=[get_kd_args_parser()])
    args = p.parse_args(BASE + [
        "--model", "SLaK_debug",
        "--teacher_kernel_size", "13", "11", "9", "7", "5",
        "--teacher_width_factor", "1.0",
        "--model_s", "SLaK_debug", "--distill_type", "KD",
        "--output_dir", ""])
    res = main(args)
    assert "max_accuracy" in res


def test_launcher_single_host():
    from slak_tpu.train.launch import main
    res = main(["--"] + BASE + ["--eval", "true"])
    assert res is not None


def test_train_cli_profile_and_mixup_mode(tmp_path):
    """--profile_dir captures a trace dir; --mixup_mode pair runs."""
    from slak_tpu.train.main import get_args_parser, main
    p = argparse.ArgumentParser(parents=[get_args_parser()])
    prof = str(tmp_path / "trace")
    # the trace window is steps [10, 20): give the epoch 24 steps
    args = p.parse_args(BASE + ["--mixup_mode", "pair",
                                "--synthetic_len", "192",
                                "--profile_dir", prof])
    main(args)
    assert os.path.isdir(prof)
    found = any(f.endswith((".pb", ".json.gz", ".xplane.pb"))
                for _, _, fs in os.walk(prof) for f in fs)
    assert found, "no profiler artifacts written"


def test_train_cli_tp_eval(tmp_path):
    """--tp_eval: channel-sharded evaluation through the CLI (4-way mesh)
    at a NON-divisible width factor — SLaK_debug dims (8,16,24,32) * 1.3
    -> (10,20,31,41), 31/41 prime — driving the pad_for_tp route the
    flagship (124/249/499/998) takes in production."""
    from slak_tpu.train.main import get_args_parser, main
    p = argparse.ArgumentParser(parents=[get_args_parser()])
    out = str(tmp_path / "run")
    wf = ["--width_factor", "1.3"]
    main(p.parse_args(BASE + wf + ["--output_dir", out]))
    stats = main(p.parse_args(
        BASE[:-2] + wf + ["--n_devices", "4", "--output_dir", out,
                          "--eval", "true", "--tp_eval", "true"]))
    assert 0.0 <= stats["acc1"] <= 1.0
