"""Multi-host TPU launcher — the replacement for the reference's SLURM /
submitit stack (``run_with_submitit.py``) and its env-var rendezvous dance
(``utils.py:296-332``).

On TPU pods there is no mpirun/torchrun: every host runs the same program
and ``jax.distributed.initialize()`` discovers the slice topology from the
TPU metadata (or from ``--coordinator`` for CPU/GPU clusters). Preemption
recovery is the ``auto_resume`` path in the training CLI — the reference's
``Trainer.checkpoint()`` requeue trick (``run_with_submitit.py:57-65``)
collapses to "restart the binary, resume from the newest checkpoint".

Usage:
  python -m slak_tpu.train.launch [--coordinator host:port --num_processes N
      --process_id I] -- <train args...>
"""

from __future__ import annotations

import argparse
import sys

import jax


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    launcher = argparse.ArgumentParser("SLaK-TPU multi-host launcher")
    launcher.add_argument("--coordinator", default=None,
                          help="host:port (omit on TPU pods: auto-detected)")
    launcher.add_argument("--num_processes", type=int, default=None)
    launcher.add_argument("--process_id", type=int, default=None)
    launcher.add_argument("--kd", action="store_true",
                          help="launch the distillation CLI instead")
    if "--" in argv:
        split = argv.index("--")
        own, rest = argv[:split], argv[split + 1:]
    else:
        own, rest = [], argv
    args = launcher.parse_args(own)

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-host fallback
            print(f"single-host mode ({e})")

    print(f"process {jax.process_index()}/{jax.process_count()}, "
          f"{jax.local_device_count()} local / {jax.device_count()} global "
          f"devices")

    if args.kd:
        from slak_tpu.kd.main import get_kd_args_parser, main as kd_main
        p = argparse.ArgumentParser(parents=[get_kd_args_parser()])
        return kd_main(p.parse_args(rest))
    from slak_tpu.train.main import get_args_parser, main as train_main
    p = argparse.ArgumentParser(parents=[get_args_parser()])
    return train_main(p.parse_args(rest))


if __name__ == "__main__":
    main()
