"""SC09 digit classifier: feature/probability model for FID & IS.

The SaShiMi/DiffWave papers score SC09 samples with a spoken-digit
classifier (arXiv:2202.09729 §4; the classifier itself is external to the
reference repo).  No pretrained classifier ships in this image, so the
harness is self-contained: a compact log-mel CNN trainable on the REAL
SC09 training set with the CLI below, checkpointed to disk, then used to
extract (penultimate features, class probabilities) for FID / IS.
Absolute values are classifier-dependent (as FID always is); comparisons
are meaningful across models scored with the SAME checkpoint.
"""

from __future__ import annotations

import os
import pickle
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..data.stft import TacotronSTFT

SR = 16000
N_MELS = 40
N_FFT, HOP = 512, 128
N_CLASSES = 10
LABELS = ("zero", "one", "two", "three", "four",
          "five", "six", "seven", "eight", "nine")


def mel_features(audio: np.ndarray) -> np.ndarray:
    """(B, L) float [-1,1] -> (B, n_mels, frames) log-mel at the
    classifier's front-end resolution."""
    stft = TacotronSTFT(N_FFT, HOP, N_FFT, N_MELS, SR, 0.0, SR / 2)
    return stft.mel_spectrogram(np.asarray(audio, np.float32))


class MelCNN(nn.Module):
    """4-block strided conv net over (B, mels, frames, 1) log-mels."""

    width: int = 32
    n_classes: int = N_CLASSES

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        w = self.width
        for i, ch in enumerate((w, 2 * w, 4 * w, 4 * w)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"conv{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.relu(x)
        feats = jnp.mean(x, axis=(1, 2))                  # (B, 4w) pooled
        logits = nn.Dense(self.n_classes, name="head")(feats)
        return logits, feats


def _prep(mel: np.ndarray) -> np.ndarray:
    """(B, mels, frames) -> (B, mels, frames, 1), mean/scale normalized."""
    x = (np.asarray(mel, np.float32) + 5.0) / 5.0
    return x[..., None]


def extract(params, audio: np.ndarray, batch: int = 64
            ) -> Tuple[np.ndarray, np.ndarray]:
    """(probs (N, C), features (N, D)) for float [-1,1] audio (N, L)."""
    model = MelCNN()
    apply_j = jax.jit(lambda p, x: model.apply(p, x))
    probs, feats = [], []
    for s in range(0, len(audio), batch):
        mel = _prep(mel_features(audio[s:s + batch]))
        logits, f = apply_j(params, jnp.asarray(mel))
        probs.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
        feats.append(np.asarray(f))
    return np.concatenate(probs), np.concatenate(feats)


def save_classifier(path: str, params, meta: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"params": jax.tree.map(np.asarray, params),
                     "meta": meta or {}}, f)


def load_classifier(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return jax.tree.map(jnp.asarray, blob["params"]), blob.get("meta", {})


def train_classifier(data_path: str, out_path: str, epochs: int = 5,
                     batch: int = 32, lr: float = 1e-3, seed: int = 0,
                     width: int = 32, log_every: int = 50) -> Dict[str, Any]:
    """Train the mel-CNN on a labeled SC09 directory tree and checkpoint it.

    Labels are the wav files' parent directory names mapped through
    ``LABELS`` (unknown labels are skipped)."""
    import optax
    from ..data.sc09 import SpeechCommands

    ds = SpeechCommands(data_path)
    keep = [(i, LABELS.index(ds.label(i))) for i in range(len(ds))
            if ds.label(i) in LABELS]
    if not keep:
        raise ValueError(f"no labeled digit wavs under {data_path}")
    idx = np.asarray([i for i, _ in keep])
    ys = np.asarray([y for _, y in keep], np.int32)

    model = MelCNN(width=width)
    rng = jax.random.PRNGKey(seed)
    frames = 16000 // HOP + 1
    params = model.init(rng, jnp.zeros((1, N_MELS, frames, 1)))
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(p, o, x, y):
        def loss_fn(pp):
            logits, _ = model.apply(pp, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean(), logits
        (l, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        u, o2 = optimizer.update(g, o)
        return optax.apply_updates(p, u), o2, l, acc

    rng_np = np.random.RandomState(seed)
    it = 0
    last = {}
    for ep in range(epochs):
        order = rng_np.permutation(len(idx))
        for s in range(0, len(order) - batch + 1, batch):
            sel = order[s:s + batch]
            wavs = np.stack([ds[int(idx[i])][0][0] for i in sel])
            mel = _prep(mel_features(wavs))
            params, opt_state, l, acc = step(params, opt_state,
                                             jnp.asarray(mel),
                                             jnp.asarray(ys[sel]))
            last = {"iter": it, "epoch": ep, "loss": float(l),
                    "acc": float(acc)}
            if it % log_every == 0:
                print(f"[clf] ep {ep} it {it} loss {last['loss']:.4f} "
                      f"acc {last['acc']:.3f}", flush=True)
            it += 1
    save_classifier(out_path, params,
                    meta={"width": width, "epochs": epochs, **last})
    return {"params": params, **last}


__all__ = ["MelCNN", "mel_features", "extract", "train_classifier",
           "save_classifier", "load_classifier", "LABELS"]
