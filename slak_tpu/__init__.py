"""slak_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
VITA-Group/SLaK (ICLR 2023: "More ConvNets in the 2020s: Scaling up Kernels
Beyond 51x51 using Sparsity").

Layers (bottom-up), mirroring the reference's layer map (SURVEY.md §1) but
re-designed TPU-first:

- ``slak_tpu.ops``      — Pallas/XLA compute ops (large-kernel depthwise conv,
                          batchnorm); the TPU-native replacement for the
                          reference's CUTLASS implicit-GEMM CUDA extension.
- ``slak_tpu.models``   — SLaK / ConvNeXt model family (NHWC, functional).
- ``slak_tpu.sparsity`` — dynamic sparse training (prune-and-grow / DST),
                          the functional equivalent of ``sparse_core.py`` /
                          ``funcs.py`` in the reference.
- ``slak_tpu.data``     — input pipeline (RandAugment, mixup/cutmix, random
                          erasing) matching the timm recipe the reference uses.
- ``slak_tpu.train``    — optimizer (AdamW + layer decay), schedules, EMA,
                          jitted train/eval steps, checkpointing.
- ``slak_tpu.parallel`` — device mesh / sharding helpers (DP over ICI; the
                          reference's DDP+NCCL equivalent).
- ``slak_tpu.kd``       — knowledge distillation losses/engine (NKD/KD/FD/MGD).
- ``slak_tpu.analysis`` — ERF visualization, sparse-aware FLOPs counting.
"""

__version__ = "0.1.0"
