"""Multi-host (DCN) scaffolding: jax.distributed init + process-0 guards.

The reference is single-host only (nn.DataParallel,
/root/reference/run.py:636-644); SURVEY §2.2 names multi-host DCN support
as the TPU-pod story. This module keeps it minimal and explicit:

- `maybe_initialize(args)`: calls `jax.distributed.initialize()` when
  `--multihost` is set (coordinator/process env comes from the TPU
  runtime or the standard JAX env vars). Must run before any other JAX
  call. No-op on single host.
- `is_main_process()`: process-0 check guarding host-side side effects —
  tensorboard writing, checkpoint saves, report files — so a pod run
  writes each artifact exactly once. Data loading and eval math stay
  per-host (all hosts compute the same replicated values).

Untestable in this container (single process); kept deliberately small so
a v5p-pod bring-up only needs `--multihost` plus a shared filesystem or
gs:// root_path.
"""

from __future__ import annotations


_initialized = False


def maybe_initialize(args=None, coordinator_address=None,
                     num_processes=None, process_id=None) -> None:
    """Initializes jax.distributed when requested. Safe to call twice.

    Without explicit cluster parameters the coordinator/process identity
    comes from the TPU runtime / standard JAX env vars. The explicit
    form exists for multi-process CPU clusters (tests: two processes x 4
    virtual devices stand in for two hosts of a pod,
    tests/test_multihost.py)."""
    global _initialized
    if _initialized:
        return
    want = (coordinator_address is not None or
            (bool(getattr(args, 'multihost', False)) if args is not None
             else False))
    if not want:
        return
    import jax
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        jax.distributed.initialize()
    _initialized = True
    print(f'jax.distributed initialized: process '
          f'{jax.process_index()}/{jax.process_count()}, '
          f'{jax.local_device_count()} local / {jax.device_count()} '
          'global devices')


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def process_count() -> int:
    import jax
    return jax.process_count()
