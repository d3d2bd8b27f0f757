"""Device mesh + sharding rules.

The reference parallelizes with NCCL DDP only (reference ``main.py:184``,
``util/misc.py:400-439``). The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis — gradients/metrics are combined
by XLA collectives inserted automatically under ``jit`` with sharded batch
inputs (no explicit all-reduce code, SURVEY.md §2.3). An optional ``model``
axis additionally shards the transformer FFN/attention projections
(tensor parallelism over ICI) — capacity the reference does not have.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp_size: int = -1, tp_size: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp_size == -1:
        assert n % tp_size == 0, (n, tp_size)
        dp_size = n // tp_size
    assert dp_size * tp_size <= n
    devs = np.asarray(devices[: dp_size * tp_size]).reshape(dp_size, tp_size)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def _tp_spec(path_names, leaf) -> P:
    """Tensor-parallel partition rules for transformer weights.

    Column-parallel (shard output features): ffn linear1, attention qkv/value
    projections. Row-parallel (shard input features): ffn linear2, attention
    output projections. Everything else replicated; XLA inserts the
    all-reduces at the row-parallel boundaries.
    """
    names = set(path_names)
    is_kernel = path_names and path_names[-1] in ("kernel", "in_proj_weight")
    if not is_kernel or getattr(leaf, "ndim", 0) != 2:
        return P()
    if "linear1" in names or "value_proj" in names:
        return P(None, "model")
    if "linear2" in names or "output_proj" in names or "out_proj" in names:
        return P("model", None)
    if "in_proj_weight" in names:
        return P("model", None)  # [3C, C] — shard packed qkv output dim
    return P()


def param_shardings(mesh: Mesh, params: Any, tensor_parallel: bool = False):
    """NamedSharding pytree for parameters (replicated, or TP-sharded on the
    model axis when ``tensor_parallel``)."""

    def spec(path, leaf):
        if not tensor_parallel or mesh.shape["model"] == 1:
            return NamedSharding(mesh, P())
        names = [getattr(p, "key", str(p)) for p in path]
        return NamedSharding(mesh, _tp_spec(names, leaf))

    return jax.tree_util.tree_map_with_path(spec, params)
