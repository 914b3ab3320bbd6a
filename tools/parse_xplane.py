"""Summarize a ``jax.profiler.trace`` capture (xplane.pb) without
TensorBoard: per-op and per-category device-time totals.

Usage:
    python tools/parse_xplane.py /path/to/tracedir [--top N] [--raw]

Pairs with the train CLI's ``--profile_dir`` flag (slak_tpu/train/main.py)
— capture a step on TPU, then attribute time here. Parses the XSpace proto
via tensorflow.tsl (no tensorboard server / plugin-version headaches —
the stock tensorboard_plugin_profile in this image can't load TF 2.21's
pywrap API).

Categories: Pallas custom-calls (the banded conv / fused MLP kernels),
MLP-4C fusions, elementwise fusions, copies/transposes (layout glue),
and everything else, keyed by output shape.
"""

from __future__ import annotations

import argparse
import collections
import glob
import re


def _cat(name: str) -> str:
    m = re.search(r"= \(?(bf16|f32|f16|s32|u32|pred)\[([0-9,]*)\]", name)
    shape = m.group(2) if m else "?"
    # opcode = the lowercase token directly before the operand list
    # ("%op = ty[shape]{layout} opcode(%x, ...").  Searching the WHOLE
    # name string misattributes fusions whose OPERANDS are custom-call
    # results as pallas calls — a real bug found round 3.  Layout parens
    # like T(8,128) are preceded by uppercase/digits, so requiring a
    # lowercase token followed by "(" + an operand start is unambiguous.
    m2 = re.search(r"\s([a-z][a-z0-9\-\._]*)"
                   r"\((?:%|\)|[0-9]|bf16|f32|f16|f64|s32|u32|s16|u16|s8|u8|pred)",
                   name)
    head = m2.group(1) if m2 else name
    if "custom-call" in head:
        return f"pallas [{shape}]"
    if "convolution" in head:
        return "xla convolution"
    name = head
    if "fusion" in name:
        dims = shape.split(",")
        if len(dims) == 4 and dims[-1].isdigit() and int(dims[-1]) >= 400:
            return f"MLP-4C fusion [{shape}]"
        return f"fusion [{shape}]"
    for k in ("copy", "transpose", "reshape", "slice", "dynamic-update",
              "reduce", "dot", "all-reduce", "pad", "convert", "rng"):
        if k in name:
            return f"{k} [{shape}]"
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tracedir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true",
                    help="per-op names instead of categories")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(args.tracedir + "/**/*.xplane.pb",
                             recursive=True))
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {args.tracedir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot: collections.Counter = collections.Counter()
            cnt: collections.Counter = collections.Counter()
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                key = name[:120] if args.raw else _cat(name)
                tot[key] += ev.duration_ps / 1e9
                cnt[key] += 1
            print(f"{plane.name}: {sum(tot.values()):.1f} ms device time, "
                  f"{len(line.events)} ops")
            for key, ms in tot.most_common(args.top):
                print(f"  {ms:9.2f} ms  x{cnt[key]:<5} {key}")


if __name__ == "__main__":
    main()
