"""Multi-host (multi-process) execution test.

Two OS processes x 4 virtual CPU devices stand in for two hosts of a
pod (SURVEY §2.2's DCN story): each process initializes
`jax.distributed` through `parallel.distributed.maybe_initialize`,
builds the GLOBAL 8-device mesh, contributes its process-local batch
shard, and runs a jitted global-mean (the collective XLA inserts for
data-parallel gradients). Asserts: 8 global devices are visible from
each process, the global reduction sees BOTH processes' data, results
agree across processes, and `is_main_process` gates exactly one
writer."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r'''
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
os.environ['XLA_FLAGS'] = (
    '--xla_force_host_platform_device_count=4 '
    '--xla_cpu_collective_call_terminate_timeout_seconds=1200 '
    '--xla_cpu_collective_timeout_seconds=1200')
sys.path.insert(0, os.environ['NFI_REPO'])

from nerf_from_image_tpu.parallel import distributed as dist

pid = int(os.environ['NFI_PROC'])
dist.maybe_initialize(coordinator_address=os.environ['NFI_COORD'],
                      num_processes=2, process_id=pid)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

mesh = Mesh(np.asarray(jax.devices()).reshape(8), ('data',))
sharding = NamedSharding(mesh, P('data'))

# Global batch 8 x 16: process p owns rows [4p, 4p+4). Row i filled
# with i so the global mean identifies whether BOTH halves arrived.
local = np.tile(np.arange(4 * pid, 4 * pid + 4,
                          dtype=np.float32)[:, None], (1, 16))
batch = jax.make_array_from_process_local_data(sharding, local, (8, 16))

@jax.jit
def global_mean(x):
    return jnp.mean(x)  # global reduction across the mesh

out = float(global_mean(batch))
assert abs(out - 3.5) < 1e-6, out  # mean(0..7) = 3.5 -> saw both hosts

# The DataParallel training pattern: replicated params, sharded batch,
# XLA-inserted gradient psum (what train/gan.py's G/D steps do at scale).
w = jax.device_put(jnp.ones((16,)), NamedSharding(mesh, P()))

@jax.jit
def grad_step(w, x):
    return jax.grad(lambda w: jnp.mean(jnp.square(x @ w)))(w)

g = np.asarray(grad_step(w, batch))
# Row i is constant i, w = ones: x@w = 16i; d/dw mean((x@w)^2)
# = (2/8) * x^T (x@w) = 0.25 * 16 * sum(i^2) = 560 per component —
# only correct if the psum saw BOTH processes' rows.
np.testing.assert_allclose(g, 560.0, rtol=1e-5)

if dist.is_main_process():
    print('WRITER', pid, flush=True)
print('RESULT', pid, out, flush=True)
'''


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    port = socket.socket()
    port.bind(('localhost', 0))
    addr = f'localhost:{port.getsockname()[1]}'
    port.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ, NFI_REPO=repo, NFI_PROC=str(pid),
                   NFI_COORD=addr)
        # A fresh interpreter per process (no inherited JAX state).
        procs.append(subprocess.Popen(
            [sys.executable, '-c', _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out}'

    both = '\n'.join(outs)
    # Exactly one writer (process 0), both report the global mean.
    assert both.count('WRITER') == 1 and 'WRITER 0' in both, both
    vals = [float(line.split()[2]) for line in both.splitlines()
            if line.startswith('RESULT')]
    assert len(vals) == 2
    np.testing.assert_allclose(vals, 3.5)
