"""Training runtime: jitted data-parallel train step over a device mesh.

Behavioral parity with reference train.py:49-196 (``train``): run-name and
``exp/<run>`` layout, diffusion hyperparams, dataloader, Adam at
``learning_rate``, resume via ``ckpt_iter in {'max', int, -1}``, loss logging
every ``iters_per_logging``, checkpoint + in-training sample generation every
``iters_per_ckpt``, iteration budget ``n_iters``.

TPU replacements for the reference's distributed machinery
(distributed_util.py — NCCL init, param broadcast, bucketed grad allreduce):
a 1-D ``('data',)`` mesh; the batch is sharded over it and parameters are
replicated, so XLA emits the gradient all-reduce over ICI inside the single
jitted step.  One process drives all local devices (no per-GPU process
spawn / TCP rendezvous).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import schedule_from_cfg, training_loss
from ..models import construct_model
from ..parallel.mesh import (mesh_from_cfg, shard_batch, replicated,
                             is_main_process)
from ..utils.exp import local_directory
from ..data import dataloader
from .checkpoint import save_checkpoint, load_checkpoint
from .metrics import MetricsLogger
from .generate import generate


SSM_PARAM_NAMES = frozenset(
    {"log_dt", "B", "P", "inv_w_real", "w_imag", "inv_A_real", "A_imag"})


def make_optimizer(learning_rate: float, s4_lr: Optional[float] = None):
    """Adam, optionally with a separate lr for the S4 SSM tensors.

    The reference registers per-parameter lr hints on the SSM tensors
    (models/s4.py:505-518 ``OptimModule.register``) but ships no optimizer
    hook that consumes them, so everything trains at the global Adam lr
    (SURVEY §2.1 #9).  Default (``s4_lr=None``) reproduces that.  Setting
    ``train.s4_lr`` honors the hints' intent via an optax multi_transform —
    a deliberate, documented divergence.
    """
    if s4_lr is None:
        return optax.adam(learning_rate)

    def label(params):
        def walk(tree, in_kernel=False):
            return {k: (walk(v, in_kernel or k == "kernel")
                        if isinstance(v, dict)
                        else ("s4" if in_kernel and k in SSM_PARAM_NAMES
                              else "default"))
                    for k, v in tree.items()}
        return walk(params)

    return optax.multi_transform(
        {"default": optax.adam(learning_rate), "s4": optax.adam(s4_lr)},
        label)


def make_train_step(model, optimizer, schedule):
    """One jitted step: (params, opt_state, batch, mel, rng) -> (..., loss).

    ``mel`` is threaded into the loss (reference train.py:134
    ``training_loss(..., mel_spec=mel_spectrogram)``) so conditional
    (vocoder) training actually conditions; a dropout PRNG is split off and
    passed through so ``dropout > 0`` configs are stochastic rather than
    silently deterministic.
    """

    def apply_fn(p, x, t, mel=None, **kw):
        return model.apply(p, x, t, mel, train=True, **kw)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, audio, mel, rng):
        loss_rng, model_rng = jax.random.split(rng)

        def loss_fn(p):
            return training_loss(apply_fn, p, audio, schedule, loss_rng,
                                 mel_spec=mel, model_rng=model_rng)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    return step


def train(diffusion_cfg, model_cfg, dataset_cfg, generate_cfg,
          ckpt_iter="max", n_iters: int = 1000001,
          iters_per_ckpt: int = 10000, iters_per_logging: int = 100,
          learning_rate: float = 2e-4, batch_size_per_gpu: int = 4,
          s4_lr: Optional[float] = None,
          name: Optional[str] = None, mesh_cfg=None, compute_cfg=None,
          wandb_cfg=None, run_config=None, seed: int = 0,
          data_loader=None, max_seconds: Optional[float] = None
          ) -> Dict[str, Any]:
    """Run the training loop; returns final {'params', 'step', ...}.

    ``batch_size_per_gpu`` is per *device* (key name kept for reference
    parity); global batch = batch_size_per_gpu * mesh size.
    ``data_loader`` overrides the dataset-config loader (tests, synthetic
    data).  ``max_seconds`` bounds wall-clock for smoke runs.
    """
    local_path, ckpt_dir = local_directory(name, model_cfg, diffusion_cfg,
                                           dataset_cfg, "checkpoint")
    schedule = schedule_from_cfg(diffusion_cfg, fast=False)

    mesh = mesh_from_cfg(mesh_cfg)
    n_dev = mesh.devices.size
    global_batch = batch_size_per_gpu * n_dev
    precision = (compute_cfg or {}).get("precision", "bf16")
    remat = bool((compute_cfg or {}).get("remat", False))

    if data_loader is None:
        # multi-host: each process loads a DistributedSampler-style shard
        # and yields LOCAL batches of global_batch / process_count rows;
        # shard_batch assembles the global array from the local shards
        # (jax.make_array_from_process_local_data).  Single-host: one
        # loader feeds all local devices.
        n_proc = jax.process_count()
        assert global_batch % n_proc == 0, (global_batch, n_proc)
        data_loader = dataloader(dataset_cfg,
                                 batch_size=global_batch // n_proc,
                                 num_replicas=n_proc,
                                 replica_id=jax.process_index(),
                                 unconditional=model_cfg["unconditional"])
    print(f"Data loaded: {len(data_loader)} batches "
          f"({global_batch} global, {n_dev} devices)", flush=True)
    if len(data_loader) == 0:
        raise ValueError(
            f"dataset yielded 0 batches of {global_batch} — check "
            f"data_path={dataset_cfg.get('data_path')!r} (the SC09 loader "
            f"keeps only '*_nohash_*.wav' files, matching the reference's "
            f"SpeechCommands walker) and that it holds >= one batch of clips")

    model = construct_model(model_cfg, precision=precision, remat=remat)
    unconditional = bool(model_cfg["unconditional"])

    # Init params (abstractly cheap: one real init on the first batch shape)
    L = int(dataset_cfg["segment_length"])
    rng = jax.random.PRNGKey(seed)
    init_audio = jnp.zeros((1, 1, L), jnp.float32)
    init_steps = jnp.zeros((1,), jnp.int32)
    # jitted init: one compiled program instead of thousands of eager
    # dispatches (the S4 C~ setup does matrix powers per block)
    if unconditional:
        params = jax.jit(model.init)(rng, init_audio, init_steps)
    else:
        frames = L // int(dataset_cfg["hop_length"]) + 1
        params = jax.jit(model.init)(rng, init_audio, init_steps,
                                     jnp.zeros((1, 80, frames), jnp.float32))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"{model.__class__.__name__} Parameters: {n_params / 1e6:.6f}M",
          flush=True)

    optimizer = make_optimizer(learning_rate, s4_lr)
    opt_state = optimizer.init(params)

    # Resume
    ck = load_checkpoint(ckpt_dir, ckpt_iter, model_cfg)
    if ck is not None:
        params = jax.tree.map(jnp.asarray, ck["model_state_dict"])
        if ck.get("optimizer_state_dict") is not None:
            opt_state = jax.tree.map(
                jnp.asarray, jax.tree.unflatten(
                    jax.tree.structure(opt_state),
                    jax.tree.leaves(ck["optimizer_state_dict"])))
        start_iter = ck["step"] + 1
        print(f"Successfully loaded model at iteration {ck['step']}",
              flush=True)
    else:
        start_iter = 0
        print("No valid checkpoint model found - training from scratch.",
              flush=True)

    # Replicate state over the mesh; batch will be sharded over 'data'.
    with mesh:
        params = jax.device_put(params, replicated(mesh))
        opt_state = jax.device_put(opt_state, replicated(mesh))
        step_fn = make_train_step(model, optimizer, schedule)

        main_proc = is_main_process()
        logger = MetricsLogger(os.path.join("exp", local_path),
                               wandb_cfg, run_config, enabled=main_proc)
        n_iter = start_iter
        t_start = time.time()
        # per-iteration epoch-loss accumulation (ref train.py:141,189-191)
        # kept on-device: a jitted add per step instead of a D2H per step
        acc_add = jax.jit(lambda a, b: a + b)
        try:
            while n_iter < n_iters + 1:
                epoch_loss, epoch_batches = None, 0
                try:
                    from tqdm import tqdm
                    epoch_iter = tqdm(
                        data_loader, desc=f"Epoch {n_iter // max(1, len(data_loader))}",
                        leave=False)
                except ImportError:
                    epoch_iter = data_loader
                for data in epoch_iter:
                    if unconditional:
                        audio = data[0] if isinstance(data, tuple) else data
                        mel = None
                    else:
                        mel, audio = data[0], data[1]
                        mel = shard_batch(np.asarray(mel, np.float32), mesh)
                    audio = shard_batch(np.asarray(audio, np.float32), mesh)
                    step_rng = jax.random.fold_in(rng, n_iter)

                    params, opt_state, loss = step_fn(params, opt_state,
                                                      audio, mel, step_rng)
                    epoch_loss = (loss if epoch_loss is None
                                  else acc_add(epoch_loss, loss))
                    epoch_batches += 1

                    if n_iter % iters_per_logging == 0:
                        loss_v = float(loss)
                        dur = time.time() - t_start
                        logger.log({"train/loss": loss_v,
                                    "train/log_loss": float(np.log(max(loss_v, 1e-12))),
                                    "train/steps_per_sec":
                                        (n_iter - start_iter + 1) / dur},
                                   step=n_iter)
                        print(f"iter {n_iter} loss {loss_v:.5f}", flush=True)

                    if n_iter > 0 and n_iter % iters_per_ckpt == 0 \
                            and main_proc:
                        # rank-0-only writes (ref train.py:156-186)
                        save_checkpoint(ckpt_dir, n_iter, params, opt_state)
                        print(f"model at iteration {n_iter} is saved",
                              flush=True)
                        if generate_cfg is not None \
                                and int(generate_cfg.get(
                                    "n_samples", 0) or 0) > 0:
                            gen_kwargs = {
                                k: v for k, v in dict(generate_cfg).items()
                                if k not in ("ckpt_iter",)}
                            if not unconditional:
                                assert gen_kwargs.get("mel_name") is not None
                            try:
                                samples = generate(
                                    diffusion_cfg, model_cfg, dataset_cfg,
                                    ckpt_iter=n_iter, name=name,
                                    params=params, **gen_kwargs)
                                logger.log_audio(
                                    samples,
                                    int(dataset_cfg["sampling_rate"]), n_iter)
                            except Exception as e:  # sampling must not kill training
                                print(f"in-training generation failed: {e}",
                                      flush=True)

                    n_iter += 1
                    if n_iter >= n_iters + 1:
                        break
                    if max_seconds and time.time() - t_start > max_seconds:
                        break
                if epoch_batches:
                    logger.log({"train/loss_epoch":
                                float(epoch_loss) / epoch_batches},
                               step=n_iter)
                if max_seconds and time.time() - t_start > max_seconds:
                    break
        finally:
            logger.finish()

    return {"params": params, "opt_state": opt_state, "step": n_iter - 1,
            "checkpoint_dir": ckpt_dir}


def main(argv=None):
    """CLI: dwst-train <hydra-style overrides> (mirrors train.py:226).

    ``-m``/``--multirun`` sweeps comma-listed override values
    (``dwst-train -m model.d_model=32,64``) as sequential jobs, like
    Hydra's choice sweeper; each job lands in its own exp/<name> dir via
    the config-derived run naming."""
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
    print(cfg.to_yaml())
    os.makedirs("exp/", mode=0o775, exist_ok=True)
    train_cfg = dict(cfg.train)
    name = train_cfg.pop("name", None)
    train(cfg.diffusion, cfg.model, cfg.dataset, cfg.generate,
          name=name, mesh_cfg=cfg.get("mesh"), compute_cfg=cfg.get("compute"),
          wandb_cfg=cfg.get("wandb"), run_config=cfg.to_dict(), **train_cfg)


if __name__ == "__main__":
    main()
