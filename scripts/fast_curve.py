#!/usr/bin/env python
"""Speed-quality curve for ALIGNED fast sampling on a trained flagship.

The reference ships exactly one fast schedule (the DiffWave paper's
6-entry variance list, /root/reference/utils.py:133-135) and feeds it
raw step indices (broken — see BASELINE.md).  With alpha-bar step
alignment (diffusion/schedule.align_fast_steps, our default) ANY
T-entry beta list is a valid operating point, so the framework exposes
a speed-quality dial the reference does not: per-chip realtime scales
as 1/T (every step runs the same compiled program), and this script
measures the quality side of the curve.

For each T it uses the canonical 6-entry list when T=6 (comparability
with the committed gate) and a log-spaced interpolation of that list's
endpoints (1e-4 .. 0.5) otherwise, generates n samples from the final
banked checkpoint of a flagship workdir, and scores them against the
synthetic corpus with the committed classifier.

Usage:
  python scripts/fast_curve.py --workdir /tmp/flagship128_ws \
      --d-model 128 --iters 18000 [--steps 4 6 8 12] [--n 240]

Writes eval_assets/fast_curve_d<d>.json.
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "eval_assets")

# canonical DiffWave fast schedule + shape resampler — single source in
# the package (diffusion/schedule.py); "canon" measured better than pure
# log-spacing at matched T, see BASELINE.md round-5.
from diffwave_sashimi_tpu.diffusion import FAST_BETA_6, fast_beta_list

FAST_BETA_6 = list(FAST_BETA_6)


def beta_list(T: int, shape: str = "geom"):
    return fast_beta_list(T, shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/flagship128_ws")
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--iters", type=int, default=18000,
                    help="config n_iters of the trained run (run-name key)")
    ap.add_argument("--batch", type=int, default=16,
                    help="train batch of the trained run (run-name key)")
    ap.add_argument("--steps", type=int, nargs="+", default=[4, 6, 8, 12])
    ap.add_argument("--shape", choices=("geom", "canon"), default="geom")
    ap.add_argument("--merge", action="store_true",
                    help="merge points into an existing artifact instead "
                         "of overwriting it")
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--gen-batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--override", action="append", default=[])
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
    from diffwave_sashimi_tpu.utils.exp import local_directory

    t0 = time.time()
    os.chdir(args.workdir)
    corpus = synth_sc09_corpus(os.path.join(args.workdir, "corpus"))
    cfg = load_config(overrides=[
        "experiment=sc09", f"model.d_model={args.d_model}",
        f"dataset.data_path={corpus}",
        f"train.n_iters={args.iters}",
        f"train.batch_size_per_gpu={args.batch}",
    ] + list(args.override))
    name = dict(cfg.train).get("name")
    local_path, gen_root = local_directory(name, cfg.model, cfg.diffusion,
                                           cfg.dataset, "waveforms")
    ckpt_dir = os.path.join(args.workdir, "exp", local_path, "checkpoint")
    banked = sorted(int(f[:-4]) for f in os.listdir(ckpt_dir)
                    if f.endswith(".pkl") and f[:-4].isdigit())
    it = banked[-1]
    clf_ckpt = os.path.join(ASSETS, "classifier_synth.pkl")

    points = []
    for T in args.steps:
        diff = dict(cfg.diffusion)
        diff["beta"] = beta_list(T, args.shape)
        generate(diff, cfg.model, cfg.dataset, name=name, ckpt_iter=it,
                 n_samples=args.n, batch_size=args.gen_batch)
        wav_dir = os.path.join(gen_root, str(it))
        with jax.default_device(jax.devices("cpu")[0]):
            r = score(corpus, wav_dir, clf_ckpt, n=args.n)
        shape = "canonical" if T == 6 else args.shape
        dst = wav_dir + f"_curveT{T}{shape}"
        shutil.rmtree(dst, ignore_errors=True)
        shutil.move(wav_dir, dst)
        points.append({"T": T, "shape": shape, "fid": r["fid"],
                       "is": r["is"]})
        print(f"[curve] T={T} ({shape}): FID {r['fid']} IS {r['is']}",
              flush=True)

    out = os.path.join(ASSETS, f"fast_curve_d{args.d_model}.json")
    if args.merge:
        with open(out) as f:
            artifact = json.load(f)
        seen = {(p["T"], p.get("shape")) for p in points}
        artifact["points"] = [p for p in artifact["points"]
                              if (p["T"], p.get("shape")) not in seen]
        artifact["points"] += points
        artifact["points"].sort(key=lambda p: (p["T"], p.get("shape") or ""))
    else:
        artifact = {
            "protocol": (f"aligned fast schedules on the final checkpoint "
                         f"(iter {it}) of sashimi d{args.d_model}; beta "
                         f"1e-4..0.5 per-point shape as tagged (canonical "
                         f"list at T=6); n={args.n} vs the full synthetic "
                         f"corpus"),
            "model": f"sashimi d{args.d_model} ({it} iters)",
            "points": points,
            "x_realtime_note": ("per-chip realtime scales ~1/T of the "
                                "T=200 exact path's per-step cost; see "
                                "bench.py fast_T6_x_realtime for the "
                                "measured T=6 point"),
        }
    artifact["wall_s"] = round(time.time() - t0, 1)
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[curve] wrote {out}", flush=True)
    print(json.dumps(artifact), flush=True)


if __name__ == "__main__":
    main()
