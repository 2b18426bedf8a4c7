"""AOT model export: serving predict as portable StableHLO artifacts.

The reference has no export or serving surface at all (SURVEY.md §2.4 — its
deployment story ends at torch checkpoints), so this is a TPU-native
framework capability in support of the BASELINE.md serving target: the
per-batch-size-bucket AOT predict programs that ``serve.py`` compiles at
server start are serialized with ``jax.export`` into ONE artifact file that

- loads and runs WITHOUT the model code (no flax model defs, no
  ``models/transformer.py`` — just the jax runtime + numpy),
- is **multi-platform** by default (``cpu`` + ``tpu``): export once on a dev
  host, serve the same file on the chip,
- carries the model config, head thresholds and parameters alongside the
  programs, so an artifact is a complete, self-describing serving unit.

Format: a zip archive (stdlib ``zipfile``) containing ``meta.json`` (artifact
version, config dict, bucket list, threshold settings, platforms),
``params.msgpack`` (the parameter pytree, stored once — NOT baked into each
bucket's program as constants, which would duplicate it per bucket) and one
``bucket_<B>.jexp`` serialized ``jax.export.Exported`` per batch bucket.

Portability note: the exported programs use the plain XLA path —
``use_pallas_attention`` / ``fused_ffn`` are forced off (Mosaic custom calls
would pin the artifact to one TPU toolchain); predict is deterministic so
none of the training-only kernels apply anyway.

CLI: ``python -m transformergrooveinfilling_tpu.export --checkpoint
<file-or-dir> --out model.tgix``.
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
import zipfile
from typing import Sequence

import numpy as np

ARTIFACT_VERSION = 1
_META = "meta.json"
_PARAMS = "params.msgpack"


def _predict_fn(model, use_thres: bool, thres: float):
    import jax
    import jax.numpy as jnp

    def predict(params, x):
        h_logits, v, o = model.apply({"params": params}, x,
                                     deterministic=True)
        h = jax.nn.sigmoid(h_logits)
        if use_thres:
            h = (h > thres).astype(jnp.float32)
        return jnp.concatenate([h, v, o], axis=-1)

    return predict


def export_infill(params, config, path: str,
                  batch_sizes: Sequence[int] = (1, 8, 32),
                  use_thres: bool = True, thres: float = 0.5,
                  platforms: Sequence[str] = ("cpu", "tpu")) -> str:
    """Serialize the serving predict for ``config``+``params`` to ``path``.

    ``batch_sizes`` mirror ``serve.InfillServer``'s AOT buckets; requests at
    load time route to the smallest bucket ≥ n and are padded. Returns
    ``path``.
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jexport

    from .models import build_model

    config = dataclasses.replace(config, use_pallas_attention=False,
                                 fused_ffn=False)
    model = build_model(config)
    predict = _predict_fn(model, use_thres, thres)
    # normalize to plain nested dicts of numpy BEFORE tracing: the exported
    # in_tree must match what msgpack_restore hands back at load time (a
    # FrozenDict-shaped in_tree would make every loaded artifact unusable)
    params = jax.tree.map(np.asarray, serialization.to_state_dict(params))

    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive: {batch_sizes}")
    e = config.embedding_size_src
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)

    from .train.checkpoint import _config_dict

    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "config": _config_dict(config),
        "batch_sizes": batch_sizes,
        "use_thres": bool(use_thres),
        "thres": float(thres),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META, json.dumps(meta, indent=1))
        z.writestr(_PARAMS, serialization.msgpack_serialize(params))
        for b in batch_sizes:
            exp = jexport.export(jax.jit(predict),
                                 platforms=tuple(platforms))(
                p_spec,
                jax.ShapeDtypeStruct((b, config.max_len, e), jnp.float32))
            z.writestr(f"bucket_{b}.jexp", exp.serialize())
    os.replace(tmp, path)  # atomic: never leave a half-written artifact
    return path


class ExportedInfill:
    """A loaded artifact: ``predict``/``__call__`` with the same
    bucket-pad-chunk semantics and input validation as
    ``serve.InfillServer.infill`` — but running the deserialized StableHLO
    programs, with no dependency on the package's model code."""

    def __init__(self, meta: dict, params, buckets: dict):
        self.meta = meta
        self.config_dict = meta["config"]
        self.batch_sizes = sorted(meta["batch_sizes"])
        self.params = params
        self._buckets = buckets  # b → jax.export.Exported

    @property
    def max_len(self) -> int:
        return int(self.config_dict["max_len"])

    @property
    def embedding_size_src(self) -> int:
        return int(self.config_dict["embedding_size_src"])

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.batch_sizes[-1]

    def _exec_device(self):
        """Device to run the deserialized programs on: None when the
        session's default backend is among the artifact's platforms;
        otherwise the first local device of a platform that IS (e.g. a
        cpu-only artifact loaded in a TPU-backed session — jax.export
        refuses to run a lowering on a platform it was not exported for)."""
        import jax

        plats = set(self.meta.get("platforms") or [])
        if not plats or jax.default_backend() in plats:
            return None
        for p in sorted(plats):
            try:
                return jax.local_devices(backend=p)[0]
            except RuntimeError:
                continue
        return None  # no supported backend locally: let the call raise

    def predict(self, inputs) -> np.ndarray:
        """``(N, T, E_src)`` (or single ``(T, E_src)``) → ``(N, T, 27)``."""
        x = np.asarray(inputs, np.float32)
        single = x.ndim == 2
        if single:
            x = x[None]
        expected = (self.max_len, self.embedding_size_src)
        if x.ndim != 3 or x.shape[1:] != expected:
            raise ValueError(
                f"input must be (T={expected[0]}, E={expected[1]}) or "
                f"(N, {expected[0]}, {expected[1]}); got "
                f"{np.asarray(inputs).shape}")
        n = x.shape[0]
        import contextlib

        import jax

        dev = self._exec_device()
        ctx = (jax.default_device(dev) if dev is not None
               else contextlib.nullcontext())
        pending = []
        i = 0
        with ctx:
            while i < n:
                b = self._bucket(n - i)
                chunk = x[i : i + b]
                if chunk.shape[0] < b:
                    chunk = np.pad(chunk,
                                   ((0, b - chunk.shape[0]), (0, 0), (0, 0)))
                pending.append((self._buckets[b].call(self.params, chunk),
                                min(b, n - i)))
                i += b
        out = np.concatenate(
            [np.asarray(y)[:keep] for y, keep in pending], axis=0)
        return out[0] if single else out

    __call__ = predict


def load_infill(path: str) -> ExportedInfill:
    """Load an artifact written by :func:`export_infill`."""
    from flax import serialization
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        if _META not in names:
            raise ValueError(f"{path}: not an infill export artifact "
                             "(no meta.json)")
        meta = json.loads(z.read(_META))
        version = meta.get("artifact_version")
        if version != ARTIFACT_VERSION:
            raise ValueError(
                f"{path}: artifact version {version} unsupported "
                f"(this build reads version {ARTIFACT_VERSION})")
        import jax

        if meta.get("jax_version") != jax.__version__:
            import warnings

            warnings.warn(
                f"{path}: artifact was exported under jax "
                f"{meta.get('jax_version')} but this runtime is "
                f"{jax.__version__}; StableHLO serialization is "
                "forward-compatible within jax's guarantees, but re-export "
                "if deserialization fails")
        params = serialization.msgpack_restore(z.read(_PARAMS))
        buckets = {}
        for b in meta["batch_sizes"]:
            buckets[int(b)] = jexport.deserialize(z.read(f"bucket_{b}.jexp"))
    return ExportedInfill(meta, params, buckets)


def main(argv=None):
    """Export a native checkpoint to a serving artifact."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--checkpoint", required=True,
                   help=".ckpt file, or a directory (newest epoch wins)")
    p.add_argument("--out", required=True, help="artifact path (.tgix)")
    p.add_argument("--batch_sizes", default="1,8,32",
                   help="comma-separated AOT bucket sizes")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated export platforms")
    p.add_argument("--use_thres", type=int, default=1)
    p.add_argument("--thres", type=float, default=0.5)
    args = p.parse_args(argv)

    from .train.checkpoint import (find_latest, load_checkpoint,
                                   load_checkpoint_config)

    ckpt = args.checkpoint
    if os.path.isdir(ckpt):
        try:
            ckpt, _epoch = find_latest(ckpt)
        except FileNotFoundError as e:
            raise SystemExit(f"no checkpoint found under {ckpt}: {e}")
    if ckpt.endswith(".Model"):
        raise SystemExit(
            "legacy torch .Model checkpoints must be imported first: load "
            "them through train/checkpoint.py::restore (location='local') "
            "and re-save natively, or see MIGRATION.md")
    params, _opt, epoch, loss = load_checkpoint(ckpt)
    config = load_checkpoint_config(ckpt)
    out = export_infill(
        params, config, args.out,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        use_thres=bool(args.use_thres), thres=args.thres,
        platforms=[s.strip() for s in args.platforms.split(",")])
    size_mb = os.path.getsize(out) / 1e6
    print(f"exported {ckpt} (epoch {epoch}, loss {loss:.4f}) -> {out} "
          f"({size_mb:.1f} MB, buckets {args.batch_sizes}, "
          f"platforms {args.platforms})")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
