import os

# Tests always run on a virtual 8-device CPU mesh so sharding logic is
# exercised without TPU hardware (and hermetically on any machine).
# FORCE the platform: the environment may pre-set JAX_PLATFORMS to a TPU
# plugin (and register it via a sitecustomize on PYTHONPATH) — a
# setdefault here silently ran the whole suite on the TPU backend with
# bf16 matmul defaults and per-op tunnel latency.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
if 'xla_cpu_collective_call_terminate_timeout_seconds' not in flags:
    # 8 virtual devices may serialize on a single host core; the default
    # 40s collective-rendezvous deadline aborts the process under skew.
    flags += (' --xla_cpu_collective_call_terminate_timeout_seconds=1200'
              ' --xla_cpu_collective_timeout_seconds=1200')
os.environ['XLA_FLAGS'] = flags

import pathlib  # noqa: E402
import sys  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The TPU plugin's sitecustomize sets the jax_platforms CONFIG (which
# outranks the env var) — force it back before any backend initializes.
jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: XLA CPU compiles are slow on small
# containers; cache makes test re-runs fast.
_CACHE_DIR = pathlib.Path(__file__).resolve().parent.parent / '.jax_cache'
jax.config.update('jax_compilation_cache_dir', str(_CACHE_DIR))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

GOLDEN_PATH = REPO_ROOT / 'tests' / 'golden' / 'core_golden.npz'


@pytest.fixture(scope='session')
def golden():
    assert GOLDEN_PATH.exists(), (
        'Golden fixtures missing; run scripts/gen_golden.py')
    return np.load(GOLDEN_PATH)
