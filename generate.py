#!/usr/bin/env python
"""Sample audio from a trained checkpoint.

Usage mirrors the reference CLI (reference: generate.py):
    python generate.py experiment=sc09 generate.n_samples=16
"""
from diffwave_sashimi_tpu.runtime.generate import main

if __name__ == "__main__":
    main()
