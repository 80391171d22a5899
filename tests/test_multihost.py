"""Multi-PROCESS data parallelism (the true multi-host code path).

Everything else in the suite runs jax.process_count()==1, so
``parallel.mesh.shard_batch``'s ``make_array_from_process_local_data``
branch and the rank-0 gating never execute.  Here two actual OS
processes (2 virtual CPU devices each, gloo collectives) run one train
step on per-process loader shards of a global batch; the resulting
params must match a single-process 4-device run on the same global
batch — proving the per-process shard assembly is equivalent to a
plain sharded device_put.
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns 2 OS processes, each compiles its own programs


WORKER = r"""
import os, pickle, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
import jax.numpy as jnp
import numpy as np
import optax
from diffwave_sashimi_tpu.diffusion import diffusion_schedule
from diffwave_sashimi_tpu.models.wavenet import WaveNet
from diffwave_sashimi_tpu.parallel import (is_main_process, make_mesh,
                                           replicated, shard_batch)
from diffwave_sashimi_tpu.runtime.train import make_train_step

assert jax.process_count() == 2 and jax.device_count() == 4

model = WaveNet(res_channels=8, skip_channels=8, num_res_layers=2,
                dilation_cycle=2)
schedule = diffusion_schedule(T=4, beta_0=1e-4, beta_T=0.05)
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 1, 256)),
                             jnp.zeros((1,), jnp.int32))
optimizer = optax.adam(2e-4)
mesh = make_mesh()
with mesh:
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(optimizer.init(params), replicated(mesh))
    step = make_train_step(model, optimizer, schedule)
    # global batch of 4; this process's LOCAL shard = its 2 rows (the
    # DistributedSampler-style contiguous-shard convention of
    # runtime/train.py's per-process loader)
    global_batch = (np.random.RandomState(7)
                    .randn(4, 1, 256).astype(np.float32) * 0.3)
    local = global_batch[2 * proc_id: 2 * proc_id + 2]
    batch = shard_batch(local, mesh)
    params, opt_state, loss = step(params, opt_state, batch, None,
                                   jax.random.PRNGKey(5))

if is_main_process():   # exercises the rank-0 gate too
    leaves = [np.asarray(x) for x in jax.tree.leaves(params)]
    with open(out, "wb") as f:
        pickle.dump({"loss": float(loss), "leaves": leaves}, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_step_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out = tmp_path / "params0.pkl"
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in (0, 1)]
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    with open(out, "rb") as f:
        multi = pickle.load(f)

    # single-process oracle: same global batch on a 4-device local mesh
    import jax
    import jax.numpy as jnp
    import optax
    from diffwave_sashimi_tpu.diffusion import diffusion_schedule
    from diffwave_sashimi_tpu.models.wavenet import WaveNet
    from diffwave_sashimi_tpu.parallel import (make_mesh, replicated,
                                               shard_batch)
    from diffwave_sashimi_tpu.runtime.train import make_train_step

    model = WaveNet(res_channels=8, skip_channels=8, num_res_layers=2,
                    dilation_cycle=2)
    schedule = diffusion_schedule(T=4, beta_0=1e-4, beta_T=0.05)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1, 256)),
                                 jnp.zeros((1,), jnp.int32))
    optimizer = optax.adam(2e-4)
    mesh = make_mesh(data=4)
    with mesh:
        params = jax.device_put(params, replicated(mesh))
        opt_state = jax.device_put(optimizer.init(params), replicated(mesh))
        step = make_train_step(model, optimizer, schedule)
        global_batch = (np.random.RandomState(7)
                        .randn(4, 1, 256).astype(np.float32) * 0.3)
        batch = shard_batch(global_batch, mesh)
        params, opt_state, loss = step(params, opt_state, batch, None,
                                       jax.random.PRNGKey(5))

    np.testing.assert_allclose(multi["loss"], float(loss), rtol=1e-5)
    single = [np.asarray(x) for x in jax.tree.leaves(params)]
    assert len(single) == len(multi["leaves"])
    for a, b in zip(single, multi["leaves"]):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)
