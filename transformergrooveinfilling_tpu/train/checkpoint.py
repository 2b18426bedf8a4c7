"""Checkpointing: native flax-msgpack format + legacy ``.Model`` interop.

Mirrors the reference's resume contract (SURVEY.md §5.4): files named
``transformer_run_{run}_Epoch_{ep}.ckpt`` carrying ``{epoch, params, opt_state,
loss}``, restored via ``load_model = {"location": "local", "dir": ...,
"file_pattern": ..., ["epoch": ...]}`` with newest-epoch auto-detection. A
``.Model`` (torch) file in the same directory is also accepted and converted on
the fly (models/torch_compat), so reference-trained checkpoints resume directly.
Unlike torch checkpoints, these are device-agnostic by construction.
"""

from __future__ import annotations

import json
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..models.transformer import GrooveTransformerConfig
from ..models import torch_compat

CKPT_PATTERN = "transformer_run_{}_Epoch_{}.ckpt"

_async_pool = None
_async_pending: list = []
# bounds device-buffer-holding snapshot saves in flight (save_snapshot_async)
import threading as _threading

_snapshot_slots = _threading.BoundedSemaphore(3)


def fetch_state_to_host(state) -> dict:
    """Copy params/opt_state to host numpy, detached from device buffers.

    Must run on the thread that owns the training loop *before* the next step
    is dispatched: the compiled epoch donates its input state, so the device
    buffers backing ``state`` are invalidated by the next dispatch — fetching
    them later (e.g. on a checkpoint worker thread) races with that donation
    and raises "Array has been deleted".

    Multi-host: leaves that are not fully addressable on this process
    (tensor-parallel shards living on other hosts) are first re-replicated on
    device — one XLA all-gather over the mesh — so ``device_get`` yields the
    complete value everywhere. That gather is a collective: when any leaf is
    non-addressable, EVERY process must call this function (the driver does,
    then only process 0 writes the file).
    """
    tree = (state.params, state.opt_state)
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "sharding")]
    # fully-replicated arrays (plain dp multi-host) need no collective —
    # device_get already has a complete local copy; only genuinely sharded
    # state (multi-host tp) pays the gather
    if any(not getattr(l, "is_fully_replicated", True) for l in leaves):
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = next(l.sharding.mesh for l in leaves
                    if not l.is_fully_replicated)
        rep = NamedSharding(mesh, PartitionSpec())
        tree = jax.jit(lambda t: t, out_shardings=rep)(tree)
    params, opt_state = tree
    return _payload_from(params, opt_state)


def _payload_from(params, opt_state) -> dict:
    """Device (or host) param/opt trees → the checkpoint payload dict.
    Single source of truth for the payload format — shared by the sync
    multi-host fetch and the async snapshot fetch."""
    return {
        "params": serialization.to_state_dict(
            jax.tree.map(lambda a: np.array(a), jax.device_get(params))),
        # optax states are (named)tuples; to_state_dict maps them to plain dicts
        # so msgpack can carry them — restore rebuilds via from_state_dict
        "opt_state": serialization.to_state_dict(
            jax.tree.map(lambda a: np.array(a), jax.device_get(opt_state))),
    }


_fetch_state_to_host = fetch_state_to_host  # backwards-compat alias


def save_payload_async(ckpt_dir: str, run_id: str, epoch: int, payload: dict,
                       loss: float, config: GrooveTransformerConfig):
    """Queue an already-fetched host payload (:func:`fetch_state_to_host`)
    for background serialization + write. Saves are serialized on one
    worker, preserving order; call :func:`flush_async_saves` before reading
    checkpoints back — it re-raises any write failure instead of dropping it.
    """
    global _async_pool
    import concurrent.futures

    if _async_pool is None:
        _async_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-save")
    fut = _async_pool.submit(
        _write_checkpoint, ckpt_dir, run_id, epoch, payload, loss, config)
    _async_pending.append(fut)
    return fut


def save_checkpoint_async(ckpt_dir: str, run_id: str, epoch: int, state,
                          loss: float, config: GrooveTransformerConfig):
    """Non-blocking checkpoint save: the device→host fetch happens here, on
    the calling thread (required for correctness under buffer donation — see
    :func:`fetch_state_to_host`), and only serialization + the file write run
    on a background thread."""
    return save_payload_async(ckpt_dir, run_id, epoch,
                              fetch_state_to_host(state), loss, config)


# jitted deep copy: jnp.copy per leaf guarantees FRESH output buffers (a bare
# identity jit would return the input arrays themselves), and one jit call is
# one device dispatch instead of one per leaf — which matters on tunneled
# links where each dispatch is a round-trip
_snapshot_fn = None


def snapshot_state_on_device(state):
    """Copy params/opt_state into fresh device buffers, safe to fetch from a
    background thread: nothing ever donates the snapshot, so the next epoch
    block's donation of ``state`` cannot invalidate it (the race
    :func:`fetch_state_to_host` exists to avoid). The copy itself is device
    work (~ms); the expensive device→host transfer then happens OFF the
    training thread in :func:`save_snapshot_async`."""
    global _snapshot_fn
    if _snapshot_fn is None:
        _snapshot_fn = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    return _snapshot_fn((state.params, state.opt_state))


def save_snapshot_async(ckpt_dir: str, run_id: str, epoch: int, snap,
                        loss: float, config: GrooveTransformerConfig,
                        legacy: bool = False):
    """Queue a device snapshot (:func:`snapshot_state_on_device`) for
    background fetch + serialization + write. Single-process only: on
    multi-host meshes the fetch may involve a collective gather, which must
    run on the thread driving the compiled steps — use
    :func:`fetch_state_to_host` + :func:`save_payload_async` there.

    Each queued snapshot holds its device buffers (~params+opt_state) until
    its fetch completes; a semaphore bounds the outstanding snapshots to 3 —
    submit BLOCKS past that, so a save cadence faster than the fetch can't
    accumulate unbounded device copies (HBM backpressure, not OOM)."""
    assert jax.process_count() == 1, \
        "save_snapshot_async is single-process; multi-host saves gather on " \
        "the training thread (fetch_state_to_host)"
    global _async_pool
    import concurrent.futures

    if _async_pool is None:
        _async_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-save")

    _snapshot_slots.acquire()

    def fetch_and_write():
        try:
            params, opt_state = snap
            payload = _payload_from(params, opt_state)
            _write_checkpoint(ckpt_dir, run_id, epoch, payload, loss, config)
            if legacy:
                export_legacy(ckpt_dir, run_id, epoch, payload["params"],
                              config, loss)
        finally:
            _snapshot_slots.release()

    fut = _async_pool.submit(fetch_and_write)
    _async_pending.append(fut)
    return fut


def flush_async_saves():
    """Block until every pending async save has been written; re-raise the
    first worker exception (a silently-dropped checkpoint is a data-loss bug,
    not a warning)."""
    global _async_pool
    if _async_pool is not None:
        _async_pool.shutdown(wait=True)
        _async_pool = None
    pending, _async_pending[:] = list(_async_pending), []
    for fut in pending:
        fut.result()


def save_checkpoint(ckpt_dir: str, run_id: str, epoch: int, state, loss: float,
                    config: GrooveTransformerConfig) -> str:
    return _write_checkpoint(ckpt_dir, run_id, epoch,
                             _fetch_state_to_host(state), loss, config)


def _write_checkpoint(ckpt_dir: str, run_id: str, epoch: int, payload: dict,
                      loss: float, config: GrooveTransformerConfig) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, CKPT_PATTERN.format(run_id, epoch))
    # temp + atomic rename: a crash/preemption kill mid-write must never
    # leave a truncated .ckpt as the newest file find_latest would resume from
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"state": payload,
             "meta": {"epoch": epoch, "loss": float(loss), "run_id": run_id,
                      "config": json.dumps(_config_dict(config))}}
        ))
    os.replace(tmp, path)
    _blob_cache.clear()  # never serve a pre-overwrite parse of this path
    return path


def _config_dict(config: GrooveTransformerConfig) -> dict:
    d = {k: v for k, v in config.__dict__.items()}
    d["compute_dtype"] = str(np.dtype(config.compute_dtype))
    return d


_blob_cache: dict = {}  # (path, mtime_ns, size) → parsed blob (size 1)


def _read_blob(path: str):
    """Parse a native checkpoint once per (path, mtime_ns, size) — restore
    paths read the config and then the state from the same file, and
    re-parsing the whole parameter payload twice doubles restore time for
    large models. mtime_ns+size (not float mtime) so an overwrite landing
    within coarse-mtime granularity still invalidates; saves through
    :func:`_write_checkpoint` drop the entry explicitly as well."""
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    if _blob_cache.get("key") != key:
        with open(path, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
        _blob_cache.clear()
        _blob_cache.update(key=key, blob=blob)
    return _blob_cache["blob"]


def load_checkpoint(path: str):
    """→ (params, opt_state, epoch, loss). Arrays come back as numpy,
    copied out of the parse cache so repeated loads never alias one
    mutable buffer."""
    blob = _read_blob(path)
    meta = blob["meta"]
    fresh = jax.tree.map(
        lambda a: np.array(a) if isinstance(a, np.ndarray) else a,
        (blob["state"]["params"], blob["state"]["opt_state"]))
    return fresh[0], fresh[1], int(meta["epoch"]), float(meta["loss"])


def config_from_json_dict(d: dict) -> GrooveTransformerConfig:
    """Inverse of :func:`_config_dict` — the one place the JSON form of a
    model config (checkpoint metadata AND export artifacts) turns back into
    the dataclass, so a future field needing special JSON handling is fixed
    once for both formats."""
    d = dict(d)
    d["compute_dtype"] = np.dtype(d.get("compute_dtype", "float32")).type
    return GrooveTransformerConfig(**d)


def load_checkpoint_config(path: str) -> GrooveTransformerConfig:
    """Recover the model config embedded in a native checkpoint's metadata."""
    blob = _read_blob(path)
    return config_from_json_dict(json.loads(blob["meta"]["config"]))


def load_params_and_config(path: str, legacy_config=None):
    """One checkpoint-or-dir resolver for every inference CLI (serve,
    evaluate): → ``(params, config, epoch, loss)`` with params in the
    model's native tree structure.

    ``path`` may be a directory (newest epoch wins, legacy ``.Model``
    fallback included), a native ``.ckpt``, or a reference ``.Model`` —
    the latter needs ``legacy_config`` (legacy files carry no architecture
    metadata; reference tutorial.py:36-68 hardcodes it at the call site).
    """
    from flax import serialization as _ser

    from ..models import build_model

    if os.path.isdir(path):
        try:
            path, _epoch = find_latest(path)
        except (FileNotFoundError, ValueError, OSError) as e:
            raise SystemExit(f"no checkpoint found under {path}: {e}")
    if path.endswith(".Model"):
        if legacy_config is None:
            raise SystemExit(
                f"{path} is a legacy .Model file, which carries no model "
                f"config — pass the architecture flags explicitly")
        params, epoch, loss = torch_compat.load_legacy_checkpoint(
            path, legacy_config)
        return params, legacy_config, int(epoch), float(loss)
    config = load_checkpoint_config(path)
    raw_params, _opt, epoch, loss = load_checkpoint(path)
    template = build_model(config).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, config.max_len, config.embedding_size_src)),
        deterministic=True)["params"]
    params = _ser.from_state_dict(template, raw_params)
    return params, config, int(epoch), float(loss)


def find_latest(ckpt_dir: str, file_pattern: str = CKPT_PATTERN):
    """Newest-epoch checkpoint in a dir; falls back to legacy ``.Model`` files
    (the reference's naming) if no native checkpoint matches."""
    regex = re.compile(
        re.escape(file_pattern).replace(r"\{\}", "(.+?)", 1).replace(r"\{\}", r"(\d+)", 1)
        + "$"
    )
    best = None
    for fname in os.listdir(ckpt_dir):
        m = regex.match(fname)
        if m and (best is None or int(m.group(2)) > best[0]):
            best = (int(m.group(2)), os.path.join(ckpt_dir, fname))
    if best is not None:
        return best[1], best[0]
    return torch_compat.find_latest_checkpoint(ckpt_dir)  # legacy fallback


def restore(load_model: dict, config: GrooveTransformerConfig):
    """Reference restore contract (tutorial.py:36-68 and :98-105): returns
    ``(params, opt_state_or_None, initial_epoch)``.

    ``location="local"`` restores from a directory. ``location="wandb"``
    restores from a **pre-downloaded wandb run directory** (``dir`` pointing
    at the run root or its ``files/`` subdir — the layout ``wandb sync`` /
    the wandb API produce); fetching from the wandb service itself needs
    network access and raises a clear error instead.
    """
    location = load_model.get("location", "local")
    if location == "wandb":
        run_dir = load_model.get("dir")
        candidates = ([os.path.join(run_dir, "files"), run_dir]
                      if run_dir else [])
        ckpt_dir = next(
            (d for d in candidates
             if d and os.path.isdir(d) and any(
                 f.endswith((".ckpt", ".Model")) for f in os.listdir(d))),
            None)
        if ckpt_dir is None:
            raise NotImplementedError(
                "wandb restore without a pre-downloaded run directory needs "
                "network access; download the run's files (wandb sync / the "
                "wandb API) and point load_model['dir'] at them, or use "
                "location='local'")
        load_model = dict(load_model, dir=ckpt_dir)
    elif location != "local":
        raise ValueError(f"unknown checkpoint location {location!r}; "
                         "expected 'local' or 'wandb'")
    ckpt_dir = load_model["dir"]
    pattern = load_model.get("file_pattern", CKPT_PATTERN)
    if "epoch" in load_model and load_model["epoch"] is not None:
        # explicit epoch: prefer native .ckpt over legacy .Model when both
        # exist for the epoch (.Model drops optimizer state); optionally
        # pinned to a run id, as in the reference's wandb-style restore dicts
        run_filter = load_model.get("run")
        path = None
        for fname in sorted(os.listdir(ckpt_dir),
                            key=lambda f: (not f.endswith(".ckpt"), f)):
            if not fname.endswith((".ckpt", ".Model")):
                continue
            if f"Epoch_{load_model['epoch']}." not in fname:
                continue
            if run_filter and str(run_filter) not in fname:
                continue
            path = os.path.join(ckpt_dir, fname)
            break
        if path is None:
            raise FileNotFoundError(
                f"no checkpoint for epoch {load_model['epoch']} in {ckpt_dir}")
        epoch = int(load_model["epoch"])
    else:
        path, epoch = find_latest(ckpt_dir, pattern) if pattern.endswith(".ckpt") \
            else torch_compat.find_latest_checkpoint(ckpt_dir, pattern)

    if path.endswith(".Model"):
        params, epoch, _loss = torch_compat.load_legacy_checkpoint(path, config)
        return params, None, epoch + 1
    saved = load_checkpoint_config(path)
    arch_fields = ("d_model", "n_heads", "dim_feedforward",
                   "num_encoder_layers", "num_decoder_layers", "max_len",
                   "embedding_size_src", "embedding_size_tgt")
    mismatch = [f for f in arch_fields
                if getattr(saved, f) != getattr(config, f)]
    if mismatch:
        raise ValueError(
            f"checkpoint {path} was trained with a different architecture: "
            + ", ".join(f"{f}={getattr(saved, f)} (requested "
                        f"{getattr(config, f)})" for f in mismatch)
            + "; fix the model params or use load_checkpoint_config()")
    params, opt_state, epoch, _loss = load_checkpoint(path)
    return params, opt_state, epoch + 1


def export_legacy(ckpt_dir: str, run_id: str, epoch: int, params,
                  config: GrooveTransformerConfig, loss: float) -> str:
    """Also write a torch-readable ``.Model`` alongside (reference tooling
    compatibility)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(
        ckpt_dir, f"transformer_run_{run_id}_Epoch_{epoch}.Model")
    torch_compat.save_legacy_checkpoint(
        path, jax.tree.map(np.asarray, jax.device_get(params)), config, epoch, loss)
    return path
