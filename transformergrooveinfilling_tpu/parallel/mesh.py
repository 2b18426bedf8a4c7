"""Mesh construction and parameter/batch sharding rules.

Design (SURVEY.md §5.8): a 2-D logical mesh ``("data", "model")``. Batches are
sharded over "data" (pure data parallelism — gradient all-reduce rides ICI via
XLA's implicit psum), and the transformer's wide dimensions (packed-QKV output
columns, attention output rows, FFN hidden) are sharded over "model" (tensor
parallelism). At reference model sizes dp carries the throughput; tp is exercised
by tests and the multi-chip dry-run so larger configs scale without code changes.

No NCCL/MPI analog exists or is needed: every collective is emitted by XLA from
these sharding annotations.
"""

from __future__ import annotations

import dataclasses
import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    @property
    def n_model(self) -> int:
        return self.mesh.shape["model"]


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> MeshPlan:
    """Build a ("data", "model") mesh over the available devices.

    ``n_data`` defaults to ``len(devices) // n_model``. Axis order puts "model"
    innermost so tensor-parallel collectives ride the fastest ICI links.
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(n_data, n_model)
    return MeshPlan(Mesh(dev_array, axis_names=("data", "model")))


def data_sharding(plan: MeshPlan, ndim: int = 3) -> NamedSharding:
    """Shard the leading (batch) axis over "data"; trailing axes replicated."""
    return NamedSharding(plan.mesh, P("data", *([None] * (ndim - 1))))


def replicated(plan: MeshPlan) -> NamedSharding:
    return NamedSharding(plan.mesh, P())


# path-regex → PartitionSpec rules for the groove transformer parameter tree.
# Matched against "/"-joined param paths like "encoder_layer_0/self_attn/qkv/kernel".
_PARTITION_RULES = (
    # attention: packed qkv columns and FFN hidden shard over "model"
    (r".*self_attn/qkv/kernel", P(None, "model")),
    (r".*self_attn/qkv/bias", P("model")),
    (r".*(self_attn|cross_attn)/(q|kv)/kernel", P(None, "model")),
    (r".*(self_attn|cross_attn)/(q|kv)/bias", P("model")),
    (r".*self_attn/out/kernel", P("model", None)),
    (r".*cross_attn/out/kernel", P("model", None)),
    (r".*linear1/kernel", P(None, "model")),
    (r".*linear1/bias", P("model")),
    (r".*linear2/kernel", P("model", None)),
    # everything else (embeds, norms, output head, biases of row-sharded mats)
    (r".*", P()),
)


def _spec_for_path(path: str) -> P:
    for pattern, spec in _PARTITION_RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def param_partition_specs(params) -> dict:
    """PartitionSpec pytree matching ``params`` (tensor-parallel layout above)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) for k in kp
        )

    specs = {path_str(kp): _spec_for_path(path_str(kp)) for kp, _ in flat}
    # rebuild tree with same structure
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [specs[path_str(kp)] for kp, _ in flat]
    )


def shard_params(params, plan: MeshPlan, tensor_parallel: bool = True):
    """Place a parameter tree on the mesh (tp layout or fully replicated)."""
    if tensor_parallel and plan.n_model > 1:
        specs = param_partition_specs(params)
    else:
        specs = jax.tree.map(lambda _: P(), params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(plan.mesh, s)), params, specs
    ), specs
