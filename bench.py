#!/usr/bin/env python
"""Headline benchmark: 16 kHz audio generated per second per chip at T=200.

Runs the flagship SaShiMi-DiffWave SC09 model (unet_d128_n6_pool_2_expand2_ff2,
the reference's paper-eval configuration) through the fully-compiled T=200
reverse-diffusion scan with hoisted S4 kernels, at the largest batch that
fits, and prints ONE JSON line:

    {"metric": ..., "value": realtime_factor, "unit": "x_realtime",
     "vs_baseline": value / 20.0}

vs_baseline is measured against the project target of >=20x realtime per
TPU v5e chip (BASELINE.md).  Extra context fields (batch, seconds, train
step/s) are included in the same JSON object.
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffwave_sashimi_tpu.utils import enable_compile_cache

enable_compile_cache()


# canonical DiffWave fast schedule + canon-shape resampler (measured best
# at matched T — BASELINE.md round-5: canon T=12 FID 1.24 vs exact 1.31)
from diffwave_sashimi_tpu.diffusion import FAST_BETA_6, fast_beta_list

FAST_BETA_6 = list(FAST_BETA_6)


def canon_beta(T: int):
    return fast_beta_list(T, "canon")


def build(batch: int, d_model: int = 128, L: int = 16000, T: int = 200):
    from diffwave_sashimi_tpu.diffusion import (diffusion_schedule, sampling_pipelined, make_sampling_step)
    from diffwave_sashimi_tpu.models.sashimi import Sashimi

    model = Sashimi(d_model=d_model, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    # jit the init: eager init dispatches thousands of small ops (slow on a
    # remote-compile backend); one compiled program instead
    params = jax.jit(model.init)(rng, jnp.zeros((1, 1, L), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    if T == 6:
        schedule = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02,
                                      beta=FAST_BETA_6, fast=True)
    elif T == 12:
        schedule = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02,
                                      beta=canon_beta(12), fast=True)
    else:
        schedule = diffusion_schedule(T=T, beta_0=1e-4, beta_T=0.02)

    if jax.default_backend() in ("tpu", "axon"):
        mode = "v2" if model.v2_compatible(L) else "fact"
    else:
        mode = True
    kernels = jax.jit(lambda p: model.apply(
        p, L, mode, method=Sashimi.compute_kernels))(params)

    # pipelined host-loop sampler: one jitted step dispatched T times
    # (device-side scan loops are pathologically slow on this backend)
    shape = (batch, 1, L)
    step_fn = make_sampling_step(
        lambda pk, x, t, mel: model.apply(pk[0], x, t, mel, pk[1]),
        shape, schedule)

    def run(p, k, rng):
        return sampling_pipelined(None, (p, k), shape, schedule, rng,
                                  step_fn=step_fn)

    return run, params, kernels


class _Timeout(Exception):
    pass


def _alarm(sig, frame):
    raise _Timeout()


_DEADLINE = [float("inf")]  # set by main(); module-level so phases see it


def _phase_alarm(default_s: int) -> int:
    """Per-attempt alarm, capped so no phase can run past the global
    deadline by more than a small grace period."""
    remaining = _DEADLINE[0] - time.time() + 60
    return max(1, int(min(default_s, remaining)))


def measure_generation(T: int = 200, L: int = 16000, sr: int = 16000,
                       batches=(16,)):
    """Best realtime factor over candidate batch sizes.

    Default is B16 only: the step is MXU-bound and throughput is flat in
    batch (scripts/serial_floor.py; round-3 measured B64/B128 at 1.284x vs
    B16's 1.326x — two multi-minute tunnel compiles purchasing nothing, and
    they cost BENCH_r03 its driver budget).  Set BENCH_FULL=1 to sweep the
    reference's batch-128 throughput protocol (ref README.md:215)."""
    if os.environ.get("BENCH_FULL") and batches == (16,):
        batches = (16, 64, 128, 8)
    best = None
    last_err = None
    for batch in batches:
        try:
            r = _measure_generation_one(batch, T, L, sr)
            if best is None or r[1] > best[1]:
                best = r
        except (_Timeout, Exception) as e:
            print(f"[bench] batch={batch} failed: {type(e).__name__}",
                  file=sys.stderr, flush=True)
            last_err = e
    if best is None:
        raise RuntimeError(f"all batch sizes failed: {last_err}")
    return best


def _measure_generation_one(batch: int, T: int, L: int, sr: int):
    # a hung batch (device fault that never surfaces) must not stall the
    # whole bench: hard-timeout each attempt
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(_phase_alarm(900))
    try:
        print(f"[bench] building batch={batch}", file=sys.stderr, flush=True)
        run, params, kernels = build(batch, L=L, T=T)
        rng = jax.random.PRNGKey(1)
        print(f"[bench] compiling sampler batch={batch}", file=sys.stderr,
              flush=True)
        out = run(params, kernels, rng)  # compile + warmup
        float(out.sum())  # force completion: block_until_ready does NOT
                          # reliably wait on this backend; a D2H does
        print(f"[bench] measuring batch={batch}", file=sys.stderr,
              flush=True)

        # slope timing: time(K runs + 1 D2H) for K=1 and K=3; the
        # difference isolates per-run compute from the (noisy, up to
        # hundreds of ms) device->host readback cost
        def timed(K, seed0):
            t0 = time.time()
            o = None
            for i in range(K):
                o = run(params, kernels, jax.random.PRNGKey(seed0 + i))
            float(o.sum())
            return time.time() - t0
        t1 = timed(1, 10)
        t3 = timed(3, 20)
        dt = max((t3 - t1) / 2, 1e-6)
        audio_seconds = batch * L / sr
        print(f"[bench] batch={batch}: {audio_seconds / dt:.3f}x realtime",
              file=sys.stderr, flush=True)
        return batch, audio_seconds / dt, dt
    finally:
        signal.alarm(0)


def measure_train_step(batch: int = 8, L: int = 16000):
    import optax
    from diffwave_sashimi_tpu.diffusion import diffusion_schedule
    from diffwave_sashimi_tpu.models.sashimi import Sashimi
    from diffwave_sashimi_tpu.runtime.train import make_train_step

    # remat: without it the B8 backward needs ~22 GB (> 16 GB HBM)
    model = Sashimi(d_model=128, n_layers=6, pool=(4, 4), expand=2, ff=2,
                    L=L, dtype=jnp.bfloat16, remat=True)
    schedule = diffusion_schedule(T=200, beta_0=1e-4, beta_T=0.02)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)),
                                 jnp.zeros((1,), jnp.int32))
    optimizer = optax.adam(2e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, schedule)
    batch_x = jax.random.normal(jax.random.PRNGKey(9), (batch, 1, L)) * 0.1
    params, opt_state, loss = step(params, opt_state, batch_x, None,
                                   jax.random.PRNGKey(1))
    float(loss)  # force completion (see note in measure_generation)

    def timed(K, seed0):
        nonlocal params, opt_state
        t0 = time.time()
        loss = None
        for i in range(K):
            params, opt_state, loss = step(params, opt_state, batch_x, None,
                                           jax.random.PRNGKey(seed0 + i))
        float(loss)
        return time.time() - t0
    t2 = timed(2, 30)
    t6 = timed(6, 40)
    return 4 / max(t6 - t2, 1e-6)


def measure_wavenet():
    """wnet_h256_d36 (the reference's WaveNet operating point): T=200
    sampling + train steps/s.  Guarded — failures return None."""
    import importlib.util
    signal.signal(signal.SIGALRM, _alarm)
    rt = steps = None
    try:
        signal.alarm(_phase_alarm(1200))
        spec = importlib.util.spec_from_file_location(
            "wavenet_bench", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts", "wavenet_bench.py"))
        wb = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(wb)
        rt = wb.bench_sampling(8)
        steps = wb.bench_train(4)
    except (_Timeout, Exception) as e:
        print(f"[bench] wavenet failed: {type(e).__name__}",
              file=sys.stderr, flush=True)
    finally:
        signal.alarm(0)
    return rt, steps


def measure_vocoder():
    """LJSpeech-harder vocoder point (sashimi d32, L=44000, hop 2048,
    T=50, conditional, hoisted mel conditioning): x-realtime at 22.05 kHz.
    Guarded — failures return None."""
    import importlib.util
    signal.signal(signal.SIGALRM, _alarm)
    rt = None
    try:
        signal.alarm(_phase_alarm(1200))
        spec = importlib.util.spec_from_file_location(
            "vocoder_bench", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts", "vocoder_bench.py"))
        vb = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(vb)
        rt = vb.bench_vocoder()
    except (_Timeout, Exception) as e:
        print(f"[bench] vocoder failed: {type(e).__name__}",
              file=sys.stderr, flush=True)
    finally:
        signal.alarm(0)
    return rt


def main():
    """Phased bench with incremental JSON emission.

    The driver parses the LAST JSON line it sees, under a hard wall-clock
    budget (BENCH_r03 died rc=124 with its single end-of-run print never
    reached).  So: emit the headline JSON the moment the T=200 sampling
    number exists, then RE-emit an enriched line after every subsequent
    phase; gate each phase on a global deadline (BENCH_DEADLINE_S, default
    2100 s) so a slow tunnel degrades the bench to fewer fields instead of
    zero output."""
    t_start = time.time()
    deadline = t_start + float(os.environ.get("BENCH_DEADLINE_S", "2100"))
    _DEADLINE[0] = deadline

    result = {
        "metric": "sec of 16kHz audio generated /sec/chip at T=200 "
                  "(sashimi d128 SC09)",
        "value": None,
        "unit": "x_realtime",
        "vs_baseline": None,
        "batch": None,
        "seconds_per_batch": None,
        "fast_T6_x_realtime": None,
        "fast_T12_x_realtime": None,
        "train_steps_per_sec": None,
        "train_batch": None,
        "train_mfu_est": None,
        "wavenet_t200_x_realtime": None,
        "wavenet_train_steps_per_sec": None,
        "vocoder_harder_T50_x_realtime": None,
        "bench_wall_s": None,
        "device": str(jax.devices()[0]),
        "skipped_phases": [],
    }
    # quality gate for the fast_T6 headline (committed flagship artifacts,
    # measured on this chip — see BASELINE.md round-5): aligned T=6 FID
    # sits next to the same checkpoint's T=200 FID, so fast_T6_x_realtime
    # is a quality-defensible speed claim.  Prefer the d128 artifact (the
    # exact configuration benched here); fall back to the d64 one.
    for _name in ("flagship_fid_d128.json", "flagship_fid.json"):
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "eval_assets", _name)) as f:
                _fid = json.load(f)
            if "final_large_n" in _fid:
                # full-corpus rescore of the final checkpoint — robust
                # to the single-draw variance of the n=72 trend points
                result["flagship_fid_T200"] = \
                    _fid["final_large_n"]["T200"]["fid"]
                result["flagship_fid_fast_T6_aligned"] = \
                    _fid["final_large_n"]["fast_T6_aligned"]["fid"]
            else:
                result["flagship_fid_T200"] = _fid["trend_T200"][-1]["fid"]
                result["flagship_fid_fast_T6_aligned"] = \
                    _fid["fast_T6_aligned"]["fid"]
            result["flagship_fid_model"] = _fid.get("model")
            break
        except (OSError, KeyError, IndexError, ValueError):
            continue
    # fast-T12 quality point (canon-shaped schedule, fast_curve artifact):
    # measured at exact-path quality, making fast_T12_x_realtime a
    # quality-PARITY >=20x claim
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "eval_assets", "fast_curve_d128.json")) as f:
            _curve = json.load(f)
        result["flagship_fid_fast_T12_canon"] = next(
            p["fid"] for p in _curve["points"]
            if p["T"] == 12 and p.get("shape") == "canon")
    except (OSError, KeyError, StopIteration, ValueError):
        pass

    def emit():
        result["bench_wall_s"] = round(time.time() - t_start, 1)
        print(json.dumps(result), flush=True)

    def time_left(phase: str, need_s: float) -> bool:
        if time.time() + need_s <= deadline:
            return True
        result["skipped_phases"].append(phase)
        print(f"[bench] skipping {phase}: deadline", file=sys.stderr,
              flush=True)
        return False

    # Phase 1 (headline, unguarded — if this fails there is no number):
    # T=200 sampling.
    batch, realtime, secs_per_batch = measure_generation()
    result.update(value=round(realtime, 3),
                  vs_baseline=round(realtime / 20.0, 3),
                  batch=batch,
                  seconds_per_batch=round(secs_per_batch, 3))
    emit()

    # Phase 2: train step.  Large batch amortizes the batch-independent
    # per-step kernel construction (scripts/train_ablation.py: 144 ms of
    # the 237 ms B8 step): measured 50.9 samples/s at B32 vs 43.6 at B16
    # vs 33.8 at B8 (2026-08-18/19).
    if time_left("train", 120):
        for tb in (32, 16, 8, 4, 2):
            try:
                steps_per_sec = measure_train_step(batch=tb)
            except Exception as e:
                print(f"train-step bench failed at B{tb}: "
                      f"{type(e).__name__}", file=sys.stderr)
                continue
            # MFU estimate: fwd ~0.26 TFLOP/sample (30 S4 convs at
            # 8n(Rc+S)/ch + 1x1 mixes, d128/L16000); train ~ fwd * 4
            # (bwd ~2x fwd + remat recompute ~1x); v5e bf16 peak
            # 197 TFLOP/s.  With the save_only_these_names remat policy
            # the recompute is elementwise-only, so *4 overstates executed
            # FLOPs by ~25% — an upper bound, kept for cross-round
            # comparability.
            result.update(
                train_steps_per_sec=round(steps_per_sec, 3),
                train_batch=tb,
                train_mfu_est=round(steps_per_sec * tb * 0.26 * 4 / 197.0,
                                    4))
            break
        emit()

    # Phase 3: DiffWave fast sampling — explicit 6-step beta schedule (the
    # reference's fast=True + diffusion.beta override, ref utils.py:133-135).
    if time_left("fast_T6", 120):
        try:
            _, realtime_fast, _ = measure_generation(T=6, batches=(16,))
            result["fast_T6_x_realtime"] = round(realtime_fast, 3)
        except Exception as e:
            print(f"[bench] fast-schedule bench failed: {type(e).__name__}",
                  file=sys.stderr, flush=True)
        emit()

    # Phase 3b: canon-shaped aligned 12-step schedule — measured at
    # EXACT-PATH quality (FID 1.24 vs 1.31, fast_curve_d128.json), so this
    # is the quality-parity >=20x operating point.
    if time_left("fast_T12", 120):
        try:
            _, rt12, _ = measure_generation(T=12, batches=(16,))
            result["fast_T12_x_realtime"] = round(rt12, 3)
        except Exception as e:
            print(f"[bench] fast-T12 bench failed: {type(e).__name__}",
                  file=sys.stderr, flush=True)
        emit()

    # Phase 4/5: WaveNet + vocoder extras (each internally guarded).
    if time_left("wavenet", 240):
        wnet_rt, wnet_steps = measure_wavenet()
        if wnet_rt:
            result["wavenet_t200_x_realtime"] = round(wnet_rt, 3)
        if wnet_steps:
            result["wavenet_train_steps_per_sec"] = round(wnet_steps, 3)
        emit()
    if time_left("vocoder", 240):
        voc_rt = measure_vocoder()
        if voc_rt:
            result["vocoder_harder_T50_x_realtime"] = round(voc_rt, 3)
        emit()


if __name__ == "__main__":
    main()
