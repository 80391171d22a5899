#!/usr/bin/env python
"""FID/IS of the FLAGSHIP SaShiMi-DiffWave sampler on the synthetic corpus.

The committed quality points so far score a tiny WaveNet (eval_artifact)
and the conditional vocoder (fidelity).  This scores the flagship model
family itself — sashimi at reduced width (d64, the reference README's
"smaller SC09 model" operating point, /root/reference/README.md:221-228)
— trained unconditionally on the deterministic synthetic corpus and
scored with the committed classifier checkpoint, so the number is
comparable with eval_artifact.json's bracket (real-vs-real 0.015,
real-vs-noise 45.96).

Usage: python scripts/flagship_fid.py [--iters 12000] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "eval_assets")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--d-model", type=int, default=64)
    ap.add_argument("--workdir", default="/tmp/flagship_fid_ws")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from diffwave_sashimi_tpu.utils import enable_compile_cache
        enable_compile_cache()

    from diffwave_sashimi_tpu.config import load_config
    from diffwave_sashimi_tpu.eval.sc09_eval import score
    from diffwave_sashimi_tpu.eval.synth import synth_sc09_corpus
    from diffwave_sashimi_tpu.runtime.generate import generate
    from diffwave_sashimi_tpu.runtime.train import train
    from diffwave_sashimi_tpu.utils.exp import local_directory

    t0 = time.time()
    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)
    corpus = synth_sc09_corpus(os.path.join(args.workdir, "corpus"))

    overrides = [
        "experiment=sc09", f"model.d_model={args.d_model}",
        f"dataset.data_path={corpus}",
        f"train.n_iters={args.iters}",
        f"train.iters_per_ckpt={min(3000, args.iters)}",  # bank progress
        "train.iters_per_logging=200",
        f"train.batch_size_per_gpu={args.batch}",
        "generate.n_samples=0",            # no in-training generation
        "mesh.data=1",
        "compute.remat=true",              # B16 d64 backward > HBM without
    ]
    cfg = load_config(overrides=overrides)
    train_cfg = dict(cfg.train)
    name = train_cfg.pop("name", None)
    train(cfg.diffusion, cfg.model, cfg.dataset, cfg.generate,
          name=name, mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
          run_config=cfg.to_dict(), **train_cfg)
    t_train = time.time() - t0

    gen_cfg = dict(cfg.generate)
    gen_cfg.update(n_samples=72, batch_size=args.batch, ckpt_iter="max")
    generate(cfg.diffusion, cfg.model, cfg.dataset, name=name, **gen_cfg)
    _, gen_dir = local_directory(name, cfg.model, cfg.diffusion,
                                 cfg.dataset, "waveforms")

    ckpt = os.path.join(ASSETS, "classifier_synth.pkl")
    with jax.default_device(jax.devices("cpu")[0]):
        result = score(corpus, gen_dir, ckpt, n=72)
    print(f"[flagship] FID {result['fid']} IS {result['is']}", flush=True)

    artifact = {
        "protocol": "synthetic SC09-style corpus (eval/synth.py seed 0); "
                    "classifier eval_assets/classifier_synth.pkl; "
                    "FID/IS via eval/sc09_eval.score",
        "model": (f"sashimi d{args.d_model} n6 pool(4,4) "
                  f"({args.iters} iters, {'CPU' if args.cpu else 'TPU'}, "
                  f"B{args.batch})"),
        "fid": result["fid"],
        "is": result["is"],
        "n_generated": result["n_generated"],
        "train_wall_s": round(t_train, 1),
        "wall_s": round(time.time() - t0, 1),
    }
    out = os.path.join(ASSETS, "flagship_fid.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[flagship] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
