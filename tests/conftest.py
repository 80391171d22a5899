"""Test configuration: force the CPU backend with 8 virtual devices.

The axon TPU plugin (sitecustomize) pins ``jax_platforms='axon,cpu'``; tests
must run on the host CPU (fast, deterministic, and able to emulate an
8-device mesh for sharding tests — the TPU answer to multi-node testing the
reference lacks entirely, see SURVEY.md §4).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is compile-dominated on this
# 1-core box (fast lane ~16 min cold), and the cache key includes the
# platform, so sharing the package .jax_cache dir with the TPU path is
# safe.  Only compiles >1 s are persisted (the helper's threshold), which
# is exactly the population that dominates suite time.  Cached loads
# still mmap JIT regions, so the map guard below stays necessary.
from diffwave_sashimi_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


# Modules that compile whole-model init/apply programs.  XLA:CPU has
# repeatedly segfaulted (2026-08-18/19, three distinct tests) when one of
# these large compiles is issued LATE in the suite — the same programs pass
# when compiled early in a fresh process.  Run them first.
_COMPILE_HEAVY_FIRST = (
    "test_sashimi_parity",
    "test_sashimi_compact",
    "test_conditioning",
    "test_dropout",
    "test_kernel_freq",
    "test_train_dynamics",
    "test_parallel",
    "test_ljspeech_harder",
    "test_mode_matrix",
    "test_vocoder_e2e",
)


def pytest_collection_modifyitems(config, items):
    """Auto-mark every torch-oracle test ``slow``: importing + running the
    reference torch model dominates suite time on this 1-core box.  Heavy
    non-oracle modules (multi-device training, end-to-end pipelines) carry
    an explicit module-level ``pytestmark`` instead.  Fast lane:
    ``pytest -m 'not slow'`` (~145 tests; measured 2026-08-20 on this
    1-core box: 15m55 cold / 6m06 warm cache); full lane: plain
    ``pytest`` (196 passed + 8 skipped, 16m51 warm measured).

    Also front-load the compile-heavy modules (see _COMPILE_HEAVY_FIRST)."""
    for item in items:
        if "torch_ref" in getattr(item, "fixturenames", ()):
            item.add_marker(pytest.mark.slow)

    def rank(item):
        mod = item.module.__name__.rsplit(".", 1)[-1]
        try:
            return _COMPILE_HEAVY_FIRST.index(mod)
        except ValueError:
            return len(_COMPILE_HEAVY_FIRST)

    items.sort(key=rank)  # stable: preserves in-module order


def _n_maps() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _xla_cpu_map_guard(request):
    """Keep the process under vm.max_map_count (default 65530).

    Every XLA:CPU compiled executable mmaps JIT code regions; a suite of
    hundreds of compiles accumulates tens of thousands of maps, and once
    the kernel refuses new mappings the NEXT compile segfaults inside
    backend_compile_and_load (observed repeatedly as the 'late-suite
    XLA:CPU segfault', 2026-08-18/19 — the victim test moves with
    collection order).  Dropping the jit caches releases executables and
    their mappings before the cliff.
    """
    yield
    n = _n_maps()
    log = os.environ.get("MAP_GUARD_LOG")
    if log:
        with open(log, "a") as f:
            f.write(f"{n}\t{request.node.nodeid}\n")
    if n > 52000:
        jax.clear_caches()
        import gc
        gc.collect()


@pytest.fixture(scope="session")
def sashimi_small():
    """One shared tiny SaShiMi (d8/n1/pool44/L16000) with jitted init.

    Session-scoped ON PURPOSE: each standalone compile of the block-scan
    init program has segfaulted XLA:CPU when issued late in the full
    suite (first the eager path, 2026-08-18; then a second jitted copy in
    test_sashimi_parity, 2026-08-19) — sharing ONE compile across every
    consumer keeps the suite to a single instance of that program.  The
    jit itself also matches how the library always runs init (CLAUDE.md
    fact 4)."""
    import jax.numpy as jnp
    from diffwave_sashimi_tpu.models.sashimi import Sashimi

    # smallest config whose tiers all satisfy the fixed-R layout compat
    # (deepest tier L/16 = 1000 -> n = 2048, R = 256)
    model = Sashimi(d_model=8, n_layers=1, pool=(4, 4), expand=2, ff=2,
                    L=16000)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, 16000), jnp.float32),
                                 jnp.zeros((1,), jnp.int32))
    return model, params


@pytest.fixture(scope="session")
def torch_ref():
    """Import the reference torch implementation, patched to run on CPU.

    - ``.cuda()`` on tensors/modules becomes identity.
    - ``pytorch_lightning`` (only used for rank_zero_only logging in
      models/s4.py:11) is stubbed.
    - The reference's vendored ``cauchy_naive`` fallback is missing the
      conjugate-pair sum present upstream (models/s4.py:109-116 vs the
      HazyResearch original) — tests that exercise the S4 oracle patch in a
      corrected version so the oracle matches the CUDA/pykeops semantics.
    """
    torch = pytest.importorskip("torch")

    # Stub pytorch_lightning.utilities.rank_zero_only
    import types
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        util = types.ModuleType("pytorch_lightning.utilities")
        util.rank_zero_only = lambda fn: fn
        pl.utilities = util
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = util

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)

    import models as ref_models  # reference package
    import models.s4 as ref_s4

    # Fix the vendored cauchy_naive bug (missing conjugate pairs) so the
    # reference oracle computes what its CUDA kernel computes.
    def cauchy_naive_fixed(v, z, w):
        v = torch.cat([v, v.conj()], dim=-1)
        w = torch.cat([w, w.conj()], dim=-1)
        cauchy_matrix = v.unsqueeze(-1) / (z.unsqueeze(-2) - w.unsqueeze(-1))
        return torch.sum(cauchy_matrix, dim=-2)

    ref_s4.cauchy_naive = cauchy_naive_fixed

    return types.SimpleNamespace(torch=torch, models=ref_models, s4=ref_s4)
