"""Generation runtime: checkpoint -> compiled reverse-diffusion -> wavs.

Behavioral parity with reference generate.py:58-200 (``generate``): resolve
``exp/<run>/checkpoint`` by ``ckpt_iter`` ('max' | int), optional checkpoint
averaging (``ckpt_smooth``), mel conditioning from a precomputed file
(``mel_path``/``mel_name``) or computed on the fly from
``{data_path}/{mel_name}.wav``, ``audio_length = mel_frames * hop_length``
for vocoding or ``segment_length`` otherwise, batched sampling, wav files
named ``<iter//1000>k_<i>.wav`` under ``exp/<run>/waveforms/<iter>/``.

TPU design: the whole T-step reverse process is ONE compiled ``lax.scan``
(diffusion/sampling.py); for SaShiMi the S4 convolution kernels are computed
once and closed over by the scan instead of being rebuilt in each of the T
network forwards like the reference.  Wall-clock is measured around
``block_until_ready`` (the reference's CUDA-event timing, generate.py:164-185)
and both total and realtime-factor are reported.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import (schedule_from_cfg, sampling_pipelined,
                         make_sampling_step)
from ..models import construct_model
from ..models.sashimi import Sashimi
from ..utils.exp import local_directory
from ..data.wav import save_wav, load_wav_raw
from .checkpoint import load_checkpoint, smooth_checkpoints


def select_kernel_mode(model, audio_length: int, on_tpu: bool):
    """Kernel-precompute mode for a generation length: "v2" (layout-native
    fused conv — covers every feasible layout family incl. the
    44000-sample LJSpeech-harder point via the adaptive-R layouts),
    "fact" (v1 fused conv, n <= 2^16), or True (hoisted-frequency XLA
    fallback)."""
    n = 1 << (2 * audio_length - 1).bit_length()
    if on_tpu and model.d_model % 8 == 0:
        if model.v2_compatible(audio_length):
            return "v2"
        if n <= 1 << 16:
            return "fact"
    return True


def precompute_kernels(model, params, audio_length: int):
    """Step-independent S4 kernels, computed once per generation length.

    Returned as a pytree that MUST be passed as a jit argument (closing over
    device arrays would embed them as compiled-program constants, forcing a
    device->host readback of every kernel at lowering).
    """
    if isinstance(model, Sashimi):
        mode = select_kernel_mode(
            model, audio_length,
            jax.default_backend() in ("tpu", "axon"))
        return jax.jit(lambda p: model.apply(
            p, audio_length, mode, method=Sashimi.compute_kernels))(params)
    return None


def apply_with_kernels(model, p, x, t, mel=None, kernels=None,
                       mel_conds=None):
    if mel_conds is not None:
        return model.apply(p, x, t, mel, kernels, mel_conds=mel_conds)
    if kernels is not None:
        return model.apply(p, x, t, mel, kernels)
    return model.apply(p, x, t, mel)


def precompute_mel_conds(model, params, cond_dev, audio_length: int,
                         kernels):
    """Hoisted per-block mel conditioning (Sashimi block_scan only):
    mel_conv(upsample(mel)) is step-independent, so computing it once
    removes every block's ConvTranspose upsample chain from all T
    sampling steps (it was ~95% of the vocoder step at L=44000)."""
    if cond_dev is None or not isinstance(model, Sashimi) \
            or not model.block_scan:
        return None
    compact = isinstance(kernels, dict) and isinstance(
        next(iter(kernels.values())), (tuple, list))
    return jax.jit(lambda p, m: model.apply(
        p, m, audio_length, compact,
        method=Sashimi.compute_mel_conds))(params, cond_dev)


def resolve_condition(dataset_cfg, mel_path: Optional[str],
                      mel_name: Optional[str]):
    """(mel (1, 80, frames) or None, audio_length) — ref generate.py:135-160."""
    if mel_name is None:
        return None, int(dataset_cfg["segment_length"])
    if mel_path is not None:
        from ..data.mel2samp import load_mel_file
        mel = load_mel_file(os.path.join(mel_path, f"{mel_name}.wav"))
    else:
        from ..data.mel2samp import Mel2Samp
        ds_cfg = dict(dataset_cfg)
        ds_cfg.pop("_name_")
        m2s = Mel2Samp(**ds_cfg)
        audio, _ = load_wav_raw(
            os.path.join(dataset_cfg["data_path"], f"{mel_name}.wav"))
        mel = m2s.get_mel(audio)
    mel = np.asarray(mel)[None, ...]
    audio_length = mel.shape[-1] * int(dataset_cfg["hop_length"])
    return mel, audio_length


def generate(diffusion_cfg, model_cfg, dataset_cfg,
             ckpt_iter="max", n_samples: int = 1, name: Optional[str] = None,
             batch_size: Optional[int] = None, ckpt_smooth=None,
             mel_path: Optional[str] = None, mel_name: Optional[str] = None,
             params=None, rank: int = 0, world: int = 1, seed: int = 0,
             precision: str = "f32", write_wavs: bool = True,
             profile_dir: Optional[str] = None) -> np.ndarray:
    """Sample ``n_samples`` waveforms; returns (n_samples, 1, L) numpy.

    ``params`` short-circuits checkpoint loading (used for in-training
    generation with live parameters).
    """
    local_path, output_directory = local_directory(
        name, model_cfg, diffusion_cfg, dataset_cfg, "waveforms")
    schedule = schedule_from_cfg(diffusion_cfg, fast=True)
    model = construct_model(model_cfg, precision=precision)

    ckpt_path = os.path.join("exp", local_path, "checkpoint")
    if ckpt_iter == "max":
        from ..utils.exp import find_max_epoch
        ckpt_iter = find_max_epoch(ckpt_path)
    ckpt_iter = int(ckpt_iter)

    if params is None:
        if ckpt_smooth is not None:
            ck = smooth_checkpoints(ckpt_path, int(ckpt_smooth), ckpt_iter,
                                    model_cfg)
        else:
            ck = load_checkpoint(ckpt_path, ckpt_iter, model_cfg)
        if ck is None:
            raise FileNotFoundError(
                f"no valid checkpoint at iter {ckpt_iter} in {ckpt_path}")
        params = jax.tree.map(jnp.asarray, ck["model_state_dict"])

    output_directory = os.path.join(output_directory, str(ckpt_iter))
    os.makedirs(output_directory, mode=0o775, exist_ok=True)

    condition, audio_length = resolve_condition(dataset_cfg, mel_path,
                                                mel_name)
    if batch_size is None:
        batch_size = n_samples
    assert n_samples % batch_size == 0

    kernels = precompute_kernels(model, params, audio_length)
    cond_dev = None if condition is None else jnp.asarray(
        np.repeat(condition, batch_size, axis=0))
    mel_conds = precompute_mel_conds(model, params, cond_dev, audio_length,
                                     kernels)
    if mel_conds is not None:
        cond_dev = None   # hoisted conditioning replaces the per-step mel

    # One jitted STEP, dispatched T times from the host (pipelined): on the
    # axon backend a device-side lax.scan executes iterations ~100x slower
    # than the identical body as a top-level program (see sampling.py).
    shape = (batch_size, 1, audio_length)
    step_fn = make_sampling_step(
        lambda pkc, x, t, mel: apply_with_kernels(
            model, pkc[0], x, t, mel, kernels=pkc[1], mel_conds=pkc[2]),
        shape, schedule)

    def run(p, k, cond, rng):
        return sampling_pipelined(None, (p, k, mel_conds), shape, schedule,
                                  rng, condition=cond, step_fn=step_fn)

    key = jax.random.fold_in(jax.random.PRNGKey(seed), rank)

    import contextlib
    prof = (jax.profiler.trace(profile_dir) if profile_dir
            else contextlib.nullcontext())
    # Timing honesty (CLAUDE.md fact 5): block_until_ready does NOT
    # reliably wait on the axon backend — completion is forced by the full
    # device->host read inside the timed region.  No separate warm-up
    # sampling pass (it doubled the cost of every in-training generation);
    # the first call in a process includes compile time, so the realtime
    # factor is only printed from steady state (chunks after the first, or
    # flagged as cold otherwise).  bench.py remains the rigorous
    # slope-timed measurement.
    chunk_np = []
    chunk_secs = []
    with prof:
        for i in range(n_samples // batch_size):
            key, sub = jax.random.split(key)
            t0 = time.time()
            out = run(params, kernels, cond_dev, sub)
            chunk_np.append(np.asarray(out))        # forced D2H
            chunk_secs.append(time.time() - t0)
    generated = np.concatenate(chunk_np, axis=0)

    sr = int(dataset_cfg["sampling_rate"])
    audio_seconds = n_samples * audio_length / sr
    if len(chunk_secs) > 1:
        # steady-state: exclude the (possibly compiling) first chunk
        per = sum(chunk_secs[1:]) / (len(chunk_secs) - 1)
        rt = batch_size * audio_length / sr / per
        note = ""
    else:
        per = chunk_secs[0]
        rt = audio_seconds / sum(chunk_secs)
        note = " (single chunk; includes any compile)"
    print(f"generated {n_samples} samples of {audio_length / sr:.2f}s at "
          f"iteration {ckpt_iter} in {sum(chunk_secs):.2f}s "
          f"({rt:.2f}x realtime{note})", flush=True)
    if write_wavs:
        for i in range(n_samples):
            outfile = f"{ckpt_iter // 1000}k_{n_samples * rank + i}.wav"
            save_wav(os.path.join(output_directory, outfile), sr,
                     generated[i, 0])
    if write_wavs and mel_name is not None and rank == 0:
        # vocoding has a ground-truth waveform: emit a fidelity report
        # (utils/audio_metrics) next to the generated wavs
        try:
            import json
            from ..utils.audio_metrics import compare
            from ..data.wav import load_wav_float
            ref, _ = load_wav_float(
                os.path.join(dataset_cfg["data_path"], f"{mel_name}.wav"))
            n = min(ref.shape[-1], generated.shape[-1])
            m = compare(ref[:n], generated[0, 0, :n], sr)
            m = {k: (float(v) if np.isfinite(v) else None)
                 for k, v in m.items()}
            m["mel_name"] = mel_name
            m["ckpt_iter"] = ckpt_iter
            with open(os.path.join(output_directory, "fidelity.json"),
                      "w") as f:
                json.dump(m, f, indent=1)
            print(f"fidelity vs {mel_name}: "
                  + ", ".join(f"{k}={v:.4g}" for k, v in m.items()
                              if isinstance(v, float)), flush=True)
        except Exception as e:  # metrics must never fail generation
            print(f"fidelity metrics skipped: {type(e).__name__}: {e}",
                  flush=True)
    return generated


def main(argv=None):
    """CLI: dwst-generate <hydra-style overrides> (mirrors generate.py:203).

    ``-m``/``--multirun`` sweeps comma-listed override values as
    sequential jobs (Hydra choice sweeper; see runtime/train.main)."""
    import sys
    from ..config import extract_multirun_flag, load_config, sweep_overrides

    from ..utils import enable_compile_cache
    enable_compile_cache()
    args, multirun = extract_multirun_flag(
        argv if argv is not None else sys.argv[1:])
    if multirun:
        jobs = sweep_overrides(args)
        for i, job in enumerate(jobs):
            print(f"[multirun] job {i}/{len(jobs)}: {' '.join(job)}",
                  flush=True)
            main(job)
        return
    cfg = load_config(overrides=args)
    # strict-f32 runs also run the fused conv kernel at strict f32
    from ..ops import fftconv_pallas
    if cfg.get_path("compute.precision", "bf16") in ("f32", "float32"):
        fftconv_pallas.set_fast(False)
    # opt-in int8 MXU conv stages (+compute.conv_int8=true): quality gate
    # and the measured (negative-on-v5e) timing are in BASELINE.md
    if cfg.get_path("compute.conv_int8", False):
        from ..ops import fftconv2
        fftconv2.set_int8(True)
    print(cfg.to_yaml())
    gen_cfg = dict(cfg.generate)
    generate(cfg.diffusion, cfg.model, cfg.dataset,
             name=cfg.train.get("name"),
             precision=cfg.get_path("compute.precision", "f32"),
             profile_dir=cfg.get_path("compute.profile_dir"),
             **gen_cfg)


if __name__ == "__main__":
    main()
