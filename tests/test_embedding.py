"""Diffusion-step embedding parity vs the reference torch implementation."""

import numpy as np

from diffwave_sashimi_tpu.models.embedding import diffusion_step_embedding


def test_embedding_against_reference(torch_ref):
    torch = torch_ref.torch
    from models.utils import calc_diffusion_step_embedding

    steps = torch.tensor([[0.0], [1.0], [57.0], [199.0]])
    ref = calc_diffusion_step_embedding(steps, 128).numpy()
    ours = np.asarray(diffusion_step_embedding(np.array([0, 1, 57, 199]), 128))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_embedding_shape_and_structure():
    e = np.asarray(diffusion_step_embedding(np.arange(4), 128))
    assert e.shape == (4, 128)
    # t=0: sin half is 0, cos half is 1
    np.testing.assert_allclose(e[0, :64], 0.0, atol=1e-7)
    np.testing.assert_allclose(e[0, 64:], 1.0, atol=1e-7)
    # frequency 0 is 1.0 -> sin(t) in the first column
    np.testing.assert_allclose(e[1, 0], np.sin(1.0), atol=1e-6)
