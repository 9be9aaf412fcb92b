"""Device mesh construction and sharding rules.

The reference has no distributed story (SURVEY.md §2.6: DP is "launch N
processes on prompt shards"). Here scaling is first-class SPMD:

* axis "data"  — shards the folded batch dims (B, and through GSPMD
  propagation the B*F spatial fold and B*H*W temporal fold). All
  collectives this induces ride ICI.
* axis "model" — tensor parallelism over attention heads / MLP inner dims
  (the MXU-heavy matmuls). At 1.4B params the UNet fits one chip, so TP is
  a latency knob, not a memory requirement.

Param partition specs are derived from leaf paths; XLA/GSPMD inserts the
all-gathers/reduce-scatters.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


# -- parameter partition rules ------------------------------------------------

_COLUMN_SHARDED = ("to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj", "fc1")
_ROW_SHARDED = ("to_out", "out_proj", "fc2")
# FF GEGLU: "proj" (column) and "out" (row) inside an "ff" subtree.


def _path_names(path) -> list:
    return [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]


def param_spec(path, leaf) -> P:
    """Megatron-style TP: column-shard the qkv/up projections, row-shard the
    output projections; replicate everything else (convs, norms, embeddings).

    GroupNorm statistics are per-group, so channel sharding of norms is
    avoidable complexity — the matmuls are where the FLOPs are.
    """
    names = _path_names(path)
    if leaf.ndim < 2:
        return P()
    parent = names[-2] if len(names) >= 2 else ""
    grandparent = names[-3] if len(names) >= 3 else ""
    if names[-1] == "w":
        if parent in _COLUMN_SHARDED:
            return P(None, "model")
        if parent in _ROW_SHARDED:
            return P("model", None)
        if parent == "proj" and grandparent == "ff":
            return P(None, "model")
        if parent == "out" and grandparent == "ff":
            return P("model", None)
    return P()


def make_param_shardings(mesh: Mesh, params):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params
    )


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
