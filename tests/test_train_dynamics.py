"""Training-dynamics parity: N optimizer steps of our JAX trainer vs the
reference torch trainer from IDENTICAL weights, batches, diffusion steps,
and noise draws.

This is the substitute for comparing against the published checkpoints
(which are LFS pointers without blobs in this image): if per-step losses
and the final parameters track the reference within f32 drift over many
steps, the gradient + Adam + schedule pipeline matches end to end
(reference train.py:198-222 training_loss, torch.optim.Adam at
train.py:91 vs runtime/train.make_train_step + optax.adam).

Randomness is injected: both sides consume the same precomputed
(t, z) sequences, removing framework RNG differences.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-device / end-to-end heavy (fast lane skips)

import jax
import jax.numpy as jnp
import optax

from diffwave_sashimi_tpu.diffusion import diffusion_schedule
from diffwave_sashimi_tpu.models.sashimi import Sashimi
from diffwave_sashimi_tpu.utils.torch_compat import sashimi_from_torch

H, NL, L, B, T, STEPS, LR = 8, 1, 1024, 2, 20, 60, 2e-4


@pytest.fixture(scope="module")
def fixed_draws():
    rng = np.random.RandomState(0)
    audio = rng.randn(STEPS, B, 1, L).astype(np.float32) * 0.2
    ts = rng.randint(0, T, size=(STEPS, B)).astype(np.int32)
    zs = rng.randn(STEPS, B, 1, L).astype(np.float32)
    return audio, ts, zs


def _torch_trajectory(torch_ref, fixed_draws):
    torch = torch_ref.torch
    from models import construct_model
    audio, ts, zs = fixed_draws
    cfg = {"_name_": "sashimi", "unconditional": True, "in_channels": 1,
           "out_channels": 1, "diffusion_step_embed_dim_in": 128,
           "diffusion_step_embed_dim_mid": 512,
           "diffusion_step_embed_dim_out": 512, "unet": True,
           "d_model": H, "n_layers": NL, "pool": [4, 4], "expand": 2,
           "ff": 2, "L": L}
    torch.manual_seed(0)
    net = construct_model(dict(cfg)).train()
    # trigger the lazy S4 C~ setup so the exported weights are post-setup
    with torch.no_grad():
        net((torch.zeros(1, 1, L), torch.zeros(1, 1, dtype=torch.long)))
    sd = {k: v.clone() for k, v in net.state_dict().items()}

    from utils import calc_diffusion_hyperparams
    dh = calc_diffusion_hyperparams(T=T, beta_0=1e-4, beta_T=0.02, fast=False)
    abar = dh["Alpha_bar"]

    opt = torch.optim.Adam(net.parameters(), lr=LR)
    loss_fn = torch.nn.MSELoss()
    losses = []
    for s in range(STEPS):
        x0 = torch.from_numpy(audio[s])
        t = torch.from_numpy(ts[s].astype(np.int64)).view(B, 1, 1)
        z = torch.from_numpy(zs[s])
        xt = torch.sqrt(abar[t]) * x0 + torch.sqrt(1 - abar[t]) * z
        eps = net((xt, t.view(B, 1)))
        loss = loss_fn(eps, z)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return sd, np.asarray(losses), net


def test_loss_trajectory_matches_reference(torch_ref, fixed_draws):
    sd, ref_losses, ref_net = _torch_trajectory(torch_ref, fixed_draws)
    audio, ts, zs = fixed_draws

    model = Sashimi(d_model=H, n_layers=NL, pool=(4, 4), expand=2, ff=2,
                    L=L)
    params = sashimi_from_torch(sd, n_layers=NL, pool=(4, 4),
                                conditional=False)
    params = {"params": jax.tree.map(jnp.asarray, params)}

    sched = diffusion_schedule(T=T, beta_0=1e-4, beta_T=0.02)
    abar = sched.alpha_bar
    optimizer = optax.adam(LR)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(p, o, x0, t, z):
        def loss_fn(pp):
            a = abar[t][:, None, None]
            xt = jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * z
            eps = model.apply(pp, xt, t, train=True)
            return jnp.mean((eps - z) ** 2)
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o2 = optimizer.update(g, o, p)
        return optax.apply_updates(p, u), o2, l

    losses = []
    for s in range(STEPS):
        params, opt_state, l = step(params, opt_state,
                                    jnp.asarray(audio[s]),
                                    jnp.asarray(ts[s]), jnp.asarray(zs[s]))
        losses.append(float(l))
    losses = np.asarray(losses)

    # per-step losses track the torch trajectory within f32 drift
    np.testing.assert_allclose(losses[:10], ref_losses[:10],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(losses, ref_losses, rtol=3e-2, atol=2e-3)

    # final torch params vs final jax params (spot: the zero-init final
    # conv has learned identical values)
    ref_final = {k: v.detach().numpy()
                 for k, v in _final_net_params(torch_ref, ref_net).items()}
    ours_final = params["params"]["final_conv2"]
    np.testing.assert_allclose(np.asarray(ours_final["w"]),
                               ref_final["w"], atol=5e-5, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(ours_final["b"]),
                               ref_final["b"], atol=5e-5, rtol=1e-2)


def _final_net_params(torch_ref, net):
    sd = net.state_dict()
    # reference final zero-conv: output_conv.2 (Conv wrapping conv.weight)
    keys = [k for k in sd if "weight" in k or "bias" in k]
    wk = [k for k in keys if k.endswith("weight")][-1]
    bk = [k for k in keys if k.endswith("bias")][-1]
    return {"w": sd[wk][:, :, 0], "b": sd[bk]}
