#!/usr/bin/env python
"""FID/IS of the FLAGSHIP SaShiMi-DiffWave sampler on the synthetic corpus.

The committed quality points before round 5 scored a tiny WaveNet
(eval_artifact) and the conditional vocoder (fidelity).  This scores the
flagship model family itself — sashimi at reduced width (d64, the
reference README's "smaller SC09 model" operating point,
/root/reference/README.md:221-228) — trained unconditionally on the
deterministic synthetic corpus and scored with the committed classifier
checkpoint, so the number is comparable with eval_artifact.json's
bracket (real-vs-real 0.015, real-vs-noise 45.96).

Produces, in one training run:
  * an FID/IS TREND over every banked checkpoint (iters_per_ckpt apart)
    at the exact T=200 schedule — does quality track training at
    flagship capacity? (round-4 verdict: the 20k->100k flattening on the
    tiny WaveNet was *attributed* to capacity; this tests it);
  * a T=6 fast-schedule point from the FINAL checkpoint (the reference's
    fast inference path, ref utils.py:132-151 + generate.py:23) scored
    against the same real set — the quality gate for the >=20x
    fast-sampling speed claim in bench.py.

Usage: python scripts/flagship_fid.py [--iters 12000] [--cpu]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "eval_assets")

# DiffWave's published 6-step fast variance schedule (ref utils.py:133-135).
FAST_BETA_6 = [0.0001, 0.001, 0.01, 0.05, 0.2, 0.5]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--gen-batch", type=int, default=8)
    ap.add_argument("--n-gen", type=int, default=72)
    ap.add_argument("--d-model", type=int, default=64)
    ap.add_argument("--workdir", default="/tmp/flagship_fid_ws")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse checkpoints already in workdir")
    ap.add_argument("--override", action="append", default=[],
                    help="extra config overrides (smoke runs)")
    ap.add_argument("--t6-only", action="store_true",
                    help="skip the T200 trend; update only the fast-T6 "
                         "entries of an existing artifact")
    ap.add_argument("--out", default="flagship_fid.json",
                    help="artifact filename under eval_assets/ (e.g. "
                         "flagship_fid_d128.json for the full-width run)")
    ap.add_argument("--large-n", type=int, default=0,
                    help="rescore ONLY the final banked checkpoint, "
                         "generating this many samples per schedule (T200 "
                         "+ aligned T6), and merge a 'final_large_n' entry "
                         "into the existing --out artifact.  FID at "
                         "n_gen=72 is a high-variance single draw; the "
                         "full 240-clip corpus both sides is the robust "
                         "headline number.  Implies --skip-train.")
    args = ap.parse_args()
    if args.large_n:
        args.skip_train = True
        args.n_gen = args.large_n

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
        f"train.iters_per_ckpt={min(3000, args.iters)}",  # bank the trend
        "train.iters_per_logging=200",
        f"train.batch_size_per_gpu={args.batch}",
        "generate.n_samples=0",            # no in-training generation
        "mesh.data=1",
        "compute.remat=true",              # B16 d64 backward > HBM without
    ] + list(args.override)
    cfg = load_config(overrides=overrides)
    train_cfg = dict(cfg.train)
    name = train_cfg.pop("name", None)
    if not args.skip_train:
        train(cfg.diffusion, cfg.model, cfg.dataset, cfg.generate,
              name=name, mesh_cfg=cfg.mesh, compute_cfg=cfg.compute,
              run_config=cfg.to_dict(), **train_cfg)
    t_train = time.time() - t0

    local_path, gen_root = local_directory(name, cfg.model, cfg.diffusion,
                                           cfg.dataset, "waveforms")
    ckpt_dir = os.path.join(args.workdir, "exp", local_path, "checkpoint")
    banked = sorted(int(f[:-4]) for f in os.listdir(ckpt_dir)
                    if f.endswith(".pkl") and f[:-4].isdigit())
    clf_ckpt = os.path.join(ASSETS, "classifier_synth.pkl")

    def gen_and_score(ckpt_iter, diffusion_cfg, tag):
        """Generate n_gen wavs from one checkpoint, score vs the corpus,
        and move the wav dir aside under ``tag`` so schedules don't mix."""
        generate(diffusion_cfg, cfg.model, cfg.dataset, name=name,
                 ckpt_iter=ckpt_iter, n_samples=args.n_gen,
                 batch_size=args.gen_batch)
        wav_dir = os.path.join(gen_root, str(ckpt_iter))
        with jax.default_device(jax.devices("cpu")[0]):
            r = score(corpus, wav_dir, clf_ckpt, n=args.n_gen)
        dst = wav_dir + "_" + tag
        shutil.rmtree(dst, ignore_errors=True)
        shutil.move(wav_dir, dst)
        print(f"[flagship] iter {ckpt_iter} {tag}: FID {r['fid']} "
              f"IS {r['is']}", flush=True)
        return r

    # Large-n mode: robust headline numbers for the FINAL checkpoint only.
    # The per-point trend runs at n_gen=72 where single-draw FID variance
    # spans ~1-14 (see BASELINE.md); scoring the final checkpoint against
    # the full corpus both sides removes the draw noise.
    if args.large_n:
        with open(os.path.join(ASSETS, args.out)) as f:
            artifact = json.load(f)
        r = gen_and_score(banked[-1], cfg.diffusion, f"T200n{args.large_n}")
        diff_fast = dict(cfg.diffusion)
        diff_fast["beta"] = FAST_BETA_6
        r6 = gen_and_score(banked[-1], diff_fast,
                           f"T6alignedn{args.large_n}")
        artifact["final_large_n"] = {
            "n": args.large_n, "iter": banked[-1],
            "T200": {"fid": r["fid"], "is": r["is"]},
            "fast_T6_aligned": {"fid": r6["fid"], "is": r6["is"]},
        }
        artifact["wall_s_large_n"] = round(time.time() - t0, 1)
        out = os.path.join(ASSETS, args.out)
        with open(out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"[flagship] wrote {out}", flush=True)
        print(json.dumps(artifact), flush=True)
        return

    # 1) exact-schedule trend over every banked checkpoint
    trend = []
    if not args.t6_only:
        for it in banked:
            r = gen_and_score(it, cfg.diffusion, "T200")
            trend.append({"iter": it, "fid": r["fid"], "is": r["is"]})

    # 2) fast T=6 points from the final checkpoint (quality gate for the
    #    fast_T6 headline in bench.py): ALIGNED (the DiffWave paper's
    #    alpha-bar step matching, our default) and the reference's raw
    #    0..5 indices (align=false), measured side by side
    diff_fast = dict(cfg.diffusion)
    diff_fast["beta"] = FAST_BETA_6
    r6 = gen_and_score(banked[-1], diff_fast, "T6aligned")
    diff_raw = dict(diff_fast)
    diff_raw["align"] = False
    r6_raw = gen_and_score(banked[-1], diff_raw, "T6raw")

    prev = {}
    if args.t6_only:
        with open(os.path.join(ASSETS, args.out)) as f:
            prev = json.load(f)
        trend = prev.get("trend_T200", [])

    # start from the previous artifact so auxiliary keys written by other
    # modes (e.g. final_large_n from --large-n) survive a t6-only update
    artifact = dict(prev)
    artifact.update({
        "protocol": "synthetic SC09-style corpus (eval/synth.py seed 0); "
                    "classifier eval_assets/classifier_synth.pkl; "
                    "FID/IS via eval/sc09_eval.score",
        "model": (f"sashimi d{args.d_model} n6 pool(4,4) "
                  f"({args.iters} iters, {'CPU' if args.cpu else 'TPU'}, "
                  f"B{args.batch})"),
        "trend_T200": trend,
        "fast_T6_aligned": {"iter": banked[-1], "fid": r6["fid"],
                            "is": r6["is"]},
        "fast_T6_raw_ref_behavior": {"iter": banked[-1],
                                     "fid": r6_raw["fid"],
                                     "is": r6_raw["is"]},
        "n_generated": args.n_gen,
        "train_wall_s": prev.get("train_wall_s", round(t_train, 1)),
        "wall_s": round(time.time() - t0, 1),
    })
    out = os.path.join(ASSETS, args.out)
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[flagship] wrote {out}", flush=True)
    print(json.dumps(artifact), flush=True)


if __name__ == "__main__":
    main()
