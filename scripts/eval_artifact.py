#!/usr/bin/env python
"""Build the committed quality artifacts: a trained classifier checkpoint
plus FID/IS numbers for (a) sanity baselines and (b) REAL sampler output,
so quality regressions surface as number changes across rounds
(VERDICT r3 "make the quality loop falsifiable").

Pipeline (all CPU — deterministic, no tunnel):
  1. regenerate the deterministic synthetic SC09-style corpus
     (eval/synth.py, seed 0);
  2. train the log-mel CNN classifier on it ->
     eval_assets/classifier_synth.pkl  (COMMITTED);
  3. baselines with that checkpoint: FID(split A, split B) of the real
     corpus (should be small) and FID(real, white noise) (should be
     huge) — the falsifiability bracket;
  4. train a tiny WaveNet-DiffWave on the corpus (300 iters), generate
     with the real sampler, score FID/IS of the generated directory ->
     eval_assets/eval_artifact.json  (COMMITTED).

Usage: python scripts/eval_artifact.py [--iters 300] [--epochs 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    from diffwave_sashimi_tpu.utils import enable_compile_cache
    enable_compile_cache()

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "eval_assets")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/eval_artifact_ws")
    ap.add_argument("--tpu", action="store_true",
                    help="run the sampler train/generate on the TPU "
                         "(classifier + FID stay CPU); enables 10-50x "
                         "more training iters per wall-hour")
    args = ap.parse_args()
    t0 = time.time()

    from diffwave_sashimi_tpu.eval import classifier as clf
    from diffwave_sashimi_tpu.eval.fid import (frechet_distance,
                                               gaussian_stats)
    from diffwave_sashimi_tpu.eval.sc09_eval import _load_dir, score
    from diffwave_sashimi_tpu.eval.synth import synth_sc09_corpus

    os.makedirs(ASSETS, exist_ok=True)
    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)

    # with --tpu only the sampler train/generate runs on the device; the
    # classifier + FID legs stay on the host CPU (tiny model, and the
    # numbers must stay comparable with the CPU-built artifact)
    import contextlib
    cpu_leg = (jax.default_device(jax.devices("cpu")[0]) if args.tpu
               else contextlib.nullcontext())

    corpus = synth_sc09_corpus(os.path.join(args.workdir, "corpus"))
    ckpt = os.path.join(ASSETS, "classifier_synth.pkl")
    with cpu_leg:
        r = clf.train_classifier(corpus, ckpt, epochs=args.epochs, batch=24)
        print(f"[artifact] classifier acc {r.get('acc'):.3f} "
              f"loss {r.get('loss'):.4f}", flush=True)

        # ---- falsifiability bracket ---------------------------------
        params, _ = clf.load_classifier(ckpt)
        real = _load_dir(corpus, 72, seed=0)
        a, b = real[0::2], real[1::2]
        _, fa = clf.extract(params, a)
        _, fb = clf.extract(params, b)
        fid_split = frechet_distance(*gaussian_stats(fa),
                                     *gaussian_stats(fb))
        noise = np.random.RandomState(1).randn(36, real.shape[1]) \
            .astype(np.float32) * 0.1
        _, fn = clf.extract(params, noise)
        fid_noise = frechet_distance(*gaussian_stats(fa),
                                     *gaussian_stats(fn))
    print(f"[artifact] FID real-vs-real {fid_split:.3f}, "
          f"real-vs-noise {fid_noise:.3f}", flush=True)

    # ---- real sampler output ----------------------------------------
    from diffwave_sashimi_tpu.config import load_config
    from diffwave_sashimi_tpu.runtime.generate import generate
    from diffwave_sashimi_tpu.runtime.train import train

    overrides = [
        "experiment=sc09_wavenet", "model.res_channels=24",
        "model.skip_channels=24", "model.num_res_layers=4",
        f"dataset.data_path={corpus}", "dataset.segment_length=16000",
        f"train.n_iters={args.iters}",
        f"train.iters_per_ckpt={args.iters}",
        "train.iters_per_logging=100",
        f"train.batch_size_per_gpu={args.batch}",
        "generate.n_samples=0",
    ]
    cfg = load_config(overrides=overrides)
    train_cfg = dict(cfg.train)
    name = train_cfg.pop("name", None)
    train(cfg.diffusion, cfg.model, cfg.dataset, cfg.generate,
          name=name, run_config=cfg.to_dict(), **train_cfg)
    gen_cfg = dict(cfg.generate)
    gen_cfg.update(n_samples=24, batch_size=4, ckpt_iter="max")
    generate(cfg.diffusion, cfg.model, cfg.dataset, name=name, **gen_cfg)
    from diffwave_sashimi_tpu.utils.exp import local_directory
    _, gen_dir = local_directory(name, cfg.model, cfg.diffusion,
                                 cfg.dataset, "waveforms")
    with cpu_leg:
        result = score(corpus, gen_dir, ckpt, n=72)
    print(f"[artifact] sampler FID {result['fid']} IS {result['is']}",
          flush=True)

    artifact = {
        "protocol": "synthetic SC09-style corpus (eval/synth.py seed 0); "
                    "classifier eval_assets/classifier_synth.pkl; "
                    "FID/IS via eval/sc09_eval.score",
        "classifier_train_acc": round(float(r.get("acc")), 4),
        "fid_real_vs_real_split": round(float(fid_split), 4),
        "fid_real_vs_noise": round(float(fid_noise), 4),
        "sampler": {
            "model": (f"wavenet res24 d4 ({args.iters} iters, "
                      f"{'TPU' if args.tpu else 'CPU'})"),
            "fid": result["fid"],
            "is": result["is"],
            "n_generated": result["n_generated"],
        },
        "wall_s": round(time.time() - t0, 1),
    }
    out = os.path.join(ASSETS, "eval_artifact.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[artifact] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
