#!/usr/bin/env python
"""A/B the shifted-matmul dilated conv (ops/conv.SHIFT_MM) on the
WaveNet operating point (wnet_h256_d36, B8 T=200 sampling + B4 train),
within one session.  Round-5 lever: WaveNet sampled at 0.61x vs its own
1.61x MXU ceiling, gap attributed to XLA's dilated-conv lowering."""
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffwave_sashimi_tpu.ops import conv as convmod  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "wavenet_bench", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "wavenet_bench.py"))
wb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(wb)

for mode in (False, True):
    convmod.set_shift_mm(mode)
    print(f"--- shift_mm={mode} ---", flush=True)
    wb.bench_sampling(8)
    wb.bench_train(4)
convmod.set_shift_mm(None)
