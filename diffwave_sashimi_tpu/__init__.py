"""diffwave_sashimi_tpu: a TPU-native DiffWave + SaShiMi audio-diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
albertfgu/diffwave-sashimi: WaveNet and SaShiMi (S4) epsilon-prediction
backbones, DDPM training + sampling, SC09 unconditional generation and
LJSpeech mel-spectrogram vocoding, data-parallel training over a device mesh,
and a Hydra-compatible config/experiment surface.
"""

__version__ = "0.1.0"
