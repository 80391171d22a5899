#!/usr/bin/env python
"""Vocoder round-trip fidelity: train (mel-conditioned) -> vocode a held
source wav from its mel -> compare to the source with the BASELINE.md
acceptance metrics (waveform MSE / SNR / log-mel / multi-res STFT).
Writes one JSON file (default fidelity.json).

With no --data, builds a small synthetic harmonic corpus (the image has
no LJSpeech); pass --data <wav_dir> and --iters to run the real thing
against reference-checkpoint outputs the moment real data exists.

Usage:
    python scripts/fidelity.py [--iters 500] [--out fidelity.json]
        [--data DIR] [--cpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np
from scipy.io import wavfile


def synth_corpus(d: str, n: int = 4, sr: int = 22050, L: int = 4096):
    """Harmonic 'speech-like' tones with an amplitude envelope."""
    rng = np.random.RandomState(0)
    t = np.arange(L) / sr
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        f0 = 180 + 60 * i
        a = np.zeros(L)
        for h, w in ((1, 1.0), (2, 0.5), (3, 0.25)):
            a += w * np.sin(2 * np.pi * f0 * h * t + rng.rand() * 6.28)
        env = 0.4 + 0.3 * np.sin(2 * np.pi * 3.0 * t + i)
        a = 0.25 * a * env / np.abs(a).max()
        wavfile.write(os.path.join(d, f"LJ{i:03d}.wav"), sr,
                      (a * 32000).astype(np.int16))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--out", default="fidelity.json")
    ap.add_argument("--data", default=None)
    ap.add_argument("--d-model", type=int, default=16)
    ap.add_argument("--segment", type=int, default=4096)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from diffwave_sashimi_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from diffwave_sashimi_tpu.config import load_config
    from diffwave_sashimi_tpu.runtime.generate import generate
    from diffwave_sashimi_tpu.runtime.train import train
    from diffwave_sashimi_tpu.utils.audio_metrics import compare
    from diffwave_sashimi_tpu.data.wav import load_wav_float

    data = args.data
    if data is None:
        # zero-code-change upgrade: use real LJSpeech the moment it
        # exists anywhere conventional (data/autodetect.py)
        from diffwave_sashimi_tpu.data import detect_dataset
        data = detect_dataset("ljspeech")
        if data:
            print(f"[fidelity] auto-detected real LJSpeech at {data}",
                  flush=True)
    if data is None:
        data = "fidelity_data"
        synth_corpus(data, L=args.segment)

    overrides = [
        "experiment=ljspeech", f"model.d_model={args.d_model}",
        "model.n_layers=2", "model.mel_upsample=[16,16]",
        f"dataset.segment_length={args.segment}",
        f"dataset.data_path={data}",
        "diffusion.T=50", "diffusion.beta_T=0.05",
        f"train.n_iters={args.iters}",
        f"train.iters_per_ckpt={args.iters}",
        "train.iters_per_logging=100", "train.batch_size_per_gpu=4",
        "generate.n_samples=1", "generate.mel_name=LJ000",
        "mesh.data=1"] + (["compute.precision=f32"] if args.cpu else [])
    cfg = load_config(overrides=overrides)

    t0 = time.time()
    train(cfg.diffusion, cfg.model, cfg.dataset, None,
          mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
          **{k: v for k, v in dict(cfg.train).items() if k != "name"})
    t_train = time.time() - t0

    out = generate(cfg.diffusion, cfg.model, cfg.dataset, ckpt_iter="max",
                   n_samples=1, mel_name="LJ000")
    src, sr = load_wav_float(os.path.join(data, "LJ000.wav"))
    est = np.asarray(out[0, 0], np.float32)
    n = min(len(src), len(est))
    metrics = compare(src[:n], est[:n], sampling_rate=sr)
    result = {
        "protocol": "vocoder round-trip: mel(LJ000) -> sampler -> compare "
                    "to LJ000 (BASELINE.md fidelity metrics)",
        "data": "synthetic harmonic corpus" if args.data is None
                else args.data,
        "d_model": args.d_model, "train_iters": args.iters,
        "segment_length": args.segment, "T": 50,
        "train_wall_s": round(t_train, 1),
        **{k: (round(v, 6) if np.isfinite(v) else v)
           for k, v in metrics.items()},
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
