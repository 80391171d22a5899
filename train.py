#!/usr/bin/env python
"""Train a DiffWave model (WaveNet or SaShiMi backbone) on TPU.

Usage mirrors the reference CLI (reference: train.py):
    python train.py experiment=sc09 model.d_model=64 train.n_iters=100000
"""
from diffwave_sashimi_tpu.runtime.train import main

if __name__ == "__main__":
    main()
