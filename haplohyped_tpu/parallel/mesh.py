"""Device mesh + sharding rules.

The reference has no accelerator or multi-node parallelism (SURVEY §2.7);
this module is the communication/layout layer the TPU build adds: a
``('data', 'model')`` mesh, regex rules mapping parameter paths to
PartitionSpecs (tensor parallelism of attention/MLP on ``model``, data/fsdp
batch sharding on ``data``), and helpers shared by training and the sharded
conversion pipeline.  Collectives are XLA-inserted from shardings (psum /
all_gather over ICI) — never hand-rolled NCCL-style calls.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from haplohyped_tpu.core.config import MeshConfig

#: parameter-path regex -> PartitionSpec (first match wins).
#: Attention projections and the MLP hidden dimension shard on ``model``;
#: their output projections shard the contracting dim; all else replicated.
PARAM_RULES: tuple[tuple[str, P], ...] = (
    (r"attn/(query|key|value)/kernel$", P(None, "model", None)),
    (r"attn/out/kernel$", P("model", None, None)),
    (r"mlp_in/kernel$", P(None, "model")),
    (r"mlp_out/kernel$", P("model", None)),
    (r"mlp_in/bias$", P("model")),
    (r".*", P()),
)


def make_mesh(config: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if config is None:
        config = MeshConfig(data=len(devices), model=1)
    n = config.data * config.model
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(config.data, config.model)
    return Mesh(arr, config.axis_names)


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def param_shardings(params: Any, mesh: Mesh, rules=PARAM_RULES):
    """Pytree of NamedShardings for a parameter pytree, by path rules."""

    def assign(path, leaf):
        name = _path_str(path)
        for pattern, spec in rules:
            if re.search(pattern, name):
                # drop axes that don't fit the leaf rank
                if len(spec) > np.ndim(leaf):
                    spec_ = P(*spec[: np.ndim(leaf)])
                else:
                    spec_ = spec
                return NamedSharding(mesh, spec_)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    """Batch arrays shard their leading axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
