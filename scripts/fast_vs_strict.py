"""End-to-end fast (bf16 chain + poly GELU) vs strict (f32 + exact erf)
sampler agreement, same seeds, perturbed params (zero-init head would
mask everything otherwise)."""
import numpy as np
import jax, jax.numpy as jnp
from diffwave_sashimi_tpu.utils import enable_compile_cache
enable_compile_cache()
from diffwave_sashimi_tpu.diffusion import diffusion_schedule, make_sampling_step
from diffwave_sashimi_tpu.models.sashimi import Sashimi
from diffwave_sashimi_tpu.ops import fftconv_pallas

B, D, L, T = 4, 64, 16000, 50
model = Sashimi(d_model=D, n_layers=2, pool=(4, 4), expand=2, ff=2,
                L=L, dtype=jnp.bfloat16)
params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)),
                             jnp.zeros((1,), jnp.int32))
rng = np.random.RandomState(3)
leaves, tree = jax.tree.flatten(params)
leaves = [l + jnp.asarray(rng.randn(*l.shape).astype(np.float32) * 0.02)
          for l in leaves]
params = jax.tree.unflatten(tree, leaves)
sched = diffusion_schedule(T=T, beta_0=1e-4, beta_T=0.02)
keys = jax.random.split(jax.random.PRNGKey(1), sched.T)
sarr = jnp.stack([sched.alpha, sched.alpha_bar, sched.sigma]).astype(jnp.float32)
x0 = jax.random.normal(jax.random.PRNGKey(9), (B, 1, L))
outs = {}
for fast in (True, False):
    fftconv_pallas.set_fast(fast)
    kernels = jax.jit(lambda p: model.apply(
        p, L, "v2", method=Sashimi.compute_kernels))(params)
    step = make_sampling_step(
        lambda pk, x, t, mel: model.apply(pk[0], x, t, mel, pk[1]),
        (B, 1, L), sched)
    x = x0
    for t in range(T - 1, -1, -1):
        x = step((params, kernels), x, None, keys, sarr, np.int32(t))
    outs[fast] = np.asarray(x, np.float32)
    print(f"fast={fast}: std {outs[fast].std():.4f}", flush=True)
a, b = outs[True], outs[False]
corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
print(f"fast-vs-strict: corr {corr:.5f}  max abs diff {np.abs(a-b).max():.4f} "
      f"(signal std {b.std():.4f})", flush=True)
