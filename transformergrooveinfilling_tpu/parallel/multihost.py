"""Multi-host (multi-process) execution hooks.

A v4-8 slice is single-host, but larger slices and DCN-spanning jobs run one
JAX process per host. These helpers make the training stack multi-host-clean
(SURVEY.md §5.8):

- :func:`initialize_from_env` wires ``jax.distributed`` from standard env vars
  (coordinator address, process count/index) or TPU auto-detection;
- :func:`global_mesh` builds the ("data", "model") mesh over *all* processes'
  devices (jax.devices() is global after distributed init);
- :func:`is_main_process` gates host-side side effects — the training driver
  writes checkpoints/metrics only on process 0 (params are replicated or
  fully-addressable per the mesh, so process 0's view is complete for the
  groove-model sizes this framework targets).

Single-process runs need no initialization — every helper degrades to the
trivial answer.
"""

from __future__ import annotations

import os

import jax

from .mesh import MeshPlan, make_mesh


def initialize_from_env() -> bool:
    """Initialize jax.distributed from the environment; no-op if single-process.

    Env contract (standard JAX names): ``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID`` — any subset; unset values are
    passed as ``None`` so JAX's own auto-detection fills them in (e.g. Cloud
    TPU pod metadata). Setting ``TGI_DISTRIBUTED=1`` with *no* JAX_* vars
    requests full pod auto-detection (``jax.distributed.initialize()`` with
    no arguments). Returns True when distributed mode is active.
    """
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = os.environ.get("JAX_NUM_PROCESSES")
    process_id = os.environ.get("JAX_PROCESS_ID")
    if (coordinator is None and num_processes is None
            and not os.environ.get("TGI_DISTRIBUTED")):
        return False
    # idempotent: in-process repeat callers (sweep trials re-entering
    # train.main) must not hit initialize() twice — it raises
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return True
    # pass only what's set: forcing defaults (num_processes=1, process_id=0)
    # on every host would break any worker with a different rank
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes) if num_processes is not None else None,
        process_id=int(process_id) if process_id is not None else None,
    )
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def global_mesh(n_model: int = 1) -> MeshPlan:
    """("data", "model") mesh over every device of every process."""
    return make_mesh(n_model=n_model, devices=jax.devices())


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a globally-sharded batch (data-parallel over
    processes, equal shares)."""
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
