"""PartitionSpec rules for the DiG score network and batch pytrees.

Tensor-parallel (TP) layout for the IPA stack — the standard Megatron-style
split, adapted to IPA's fan-out/fan-in structure:

* per-head projections (``scalar_{query,key,value}``, ``point_{query,key,
  value}``, ``pair_bias``, ``pair_value``) shard their *output* feature dim
  over "model" — each chip computes a contiguous slice of heads;
* ``fc_out`` (attention fan-in) and ``ffn/fc2`` shard their *input* dim —
  the subsequent contraction produces a partial sum and XLA inserts one
  all-reduce per layer;
* ``ffn/fc1`` shards its output dim (hidden units);
* ``trained_point_weight`` (per-head gamma) shards over heads;
* everything else (layernorms, projections into/out of the trunk, heads,
  embeddings) is replicated.

Because head-count H is a leading factor of every per-head feature dim
(``H*dk``, ``H*4*3``, ...), sharding the flat feature dim over "model" is
exactly head sharding after the ``reshape(B, L, H, ...)``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix match, spec for the "kernel"/param leaf)
_COL = P(None, "model")  # shard output features
_ROW = P("model", None)  # shard input features

_TP_RULES: list[tuple[tuple[str, ...], P]] = [
    (("attn", "scalar_query", "kernel"), _COL),
    (("attn", "scalar_key", "kernel"), _COL),
    (("attn", "scalar_value", "kernel"), _COL),
    (("attn", "point_query", "kernel"), _COL),
    (("attn", "point_key", "kernel"), _COL),
    (("attn", "point_value", "kernel"), _COL),
    (("attn", "pair_bias", "kernel"), _COL),
    (("attn", "pair_value", "kernel"), _COL),
    (("attn", "trained_point_weight"), P("model")),
    (("attn", "fc_out", "kernel"), _ROW),
    (("ffn", "fc1", "kernel"), _COL),
    (("ffn", "fc2", "kernel"), _ROW),
]


def _spec_for_path(path: tuple[str, ...], leaf: jax.Array) -> P:
    for suffix, spec in _TP_RULES:
        if path[-len(suffix):] == suffix:
            return spec
    return P()  # replicated


def dig_tp_param_specs(params) -> object:
    """PartitionSpec pytree for a DiG param tree (TP over "model")."""

    def to_spec(path, leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return _spec_for_path(keys, leaf)

    return jax.tree_util.tree_map_with_path(to_spec, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, spec: P = P("data")) -> NamedSharding:
    """Shard the leading batch axis over the "data" axis."""
    return NamedSharding(mesh, spec)


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh per the TP rules."""
    specs = dig_tp_param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def shard_batch(pytree, mesh: Mesh):
    """Shard every leaf's leading axis over "data", rest replicated."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sh), pytree)
