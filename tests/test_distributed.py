"""Multi-host (multi-process) smoke: 2 processes x 2 virtual CPU devices
-> one 4-device global data-parallel mesh via parallel.distributed
(jax.distributed + gloo CPU collectives + make_array_from_process_local_data).

Each process feeds its OWN local batch shard; the jitted step computes a
global-mean loss so XLA inserts the cross-process grad psum.  Pass
criteria: replicas stay bit-synced after 3 steps and the loss drops.
This is the framework's multi-host training path — on a TPU pod the same
code runs with `initialize()` (no args) and the data axis spanning
hosts over DCN.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from tlxcv_tpu.parallel import distributed as dist

dist.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert jax.device_count() == nproc * jax.local_device_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = dist.global_mesh()
repl = NamedSharding(mesh, P())

# identical init on every process (same seed)
rng = np.random.default_rng(0)
w_true = rng.normal(size=(8, 3)).astype(np.float32)
params = {"w": jax.device_put(jnp.zeros((8, 3)), repl)}

GLOBAL_B = 32
local_b = dist.local_batch_size(GLOBAL_B)

@jax.jit
def step(params, x, y):
    def loss_fn(p):
        return jnp.mean((x @ p["w"] - y) ** 2)
    loss, g = jax.value_and_grad(loss_fn)(params)
    return jax.tree_util.tree_map(lambda p, gi: p - 0.1 * gi, params, g), loss

losses = []
for i in range(3):
    # per-process DISTINCT shard (seeded by process id + step)
    r = np.random.default_rng(100 + 10 * i + pid)
    x_loc = r.normal(size=(local_b, 8)).astype(np.float32)
    y_loc = x_loc @ w_true
    batch = dist.global_batch({"x": x_loc, "y": y_loc}, mesh)
    params, loss = step(params, batch["x"], batch["y"])
    losses.append(float(loss))

dist.assert_replica_synced(params)
dist.sync_global_devices("done")
assert losses[-1] < losses[0] * 0.7, losses
print(f"proc {pid} OK losses={losses}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_training():
    port = _free_port()
    env = os.environ.copy()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("_TLXCV_DRYRUN_CHILD", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), "2", str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out, out
