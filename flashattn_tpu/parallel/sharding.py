"""Tensor-parallel parameter sharding rules and model/mesh wiring.

Nothing to mirror in the reference (single-GPU); this implements the
Megatron-style TP layout for the DecoderLM family over a (data, model) mesh:

* QKV projections column-parallel (heads sharded over ``model``),
* attention output projection row-parallel,
* FFN linear_in column-parallel / linear_out row-parallel,
* lm_head + embeddings column-parallel over the embedding/vocab dim,
* layernorm parameters replicated.

GSPMD inserts the all-reduces after the row-parallel matmuls; the attention
kernel itself runs communication-free via the shard_map shim
(:mod:`.sharded_attention`).  The reference's "backend threading"
(TensorBackend passed through every constructor, SURVEY.md §1) becomes these
sharding annotations -- the computation graph is untouched.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..module import Module
from ..models.transformer import MultiHeadAttention
from .mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array

# (suffix pattern, spec builder) checked in order; first match wins.
# QuantizedLinear (weight-only int8/fp8) stores ``.values`` (in, out) and
# ``.scales`` (1, out): values shard exactly like ``.weights``; per-output-
# channel scales follow the out axis (replicated for row-parallel layers
# whose out axis is unsharded).
_TP_RULES = [
    ("q_projection.weights", lambda m: P(None, m)),
    ("k_projection.weights", lambda m: P(None, m)),
    ("v_projection.weights", lambda m: P(None, m)),
    ("q_projection.bias", lambda m: P(m)),
    ("k_projection.bias", lambda m: P(m)),
    ("v_projection.bias", lambda m: P(m)),
    ("out_projection.weights", lambda m: P(m, None)),
    ("out_projection.bias", lambda m: P()),
    ("linear_in.weights", lambda m: P(None, m)),
    ("linear_in.bias", lambda m: P(m)),
    ("linear_out.weights", lambda m: P(m, None)),
    ("linear_out.bias", lambda m: P()),
    ("lm_head.weights", lambda m: P(None, m)),
    ("lm_head.bias", lambda m: P(m)),
    ("token_embeddings.weights", lambda m: P(None, m)),
    ("position_embeddings.weights", lambda m: P(None, m)),
    ("q_projection.values", lambda m: P(None, m)),
    ("k_projection.values", lambda m: P(None, m)),
    ("v_projection.values", lambda m: P(None, m)),
    ("q_projection.scales", lambda m: P(None, m)),
    ("k_projection.scales", lambda m: P(None, m)),
    ("v_projection.scales", lambda m: P(None, m)),
    ("out_projection.values", lambda m: P(m, None)),
    ("out_projection.scales", lambda m: P()),
    ("linear_in.values", lambda m: P(None, m)),
    ("linear_in.scales", lambda m: P(None, m)),
    ("linear_out.values", lambda m: P(m, None)),
    ("linear_out.scales", lambda m: P()),
    ("lm_head.values", lambda m: P(None, m)),
    ("lm_head.scales", lambda m: P(None, m)),
    # Expert parallelism: stacked expert weights shard over the expert
    # (leading) axis; the router replicates and GSPMD inserts the
    # all-to-alls around the dispatch/combine einsums.
    ("ff.experts_in", lambda m: P(m, None, None)),
    ("ff.experts_out", lambda m: P(m, None, None)),
    ("ff.router.weights", lambda m: P()),
]


def tp_spec_for(path: str, model_axis: str = MODEL_AXIS) -> P:
    """PartitionSpec for a dotted parameter path under the TP rules."""
    for suffix, build in _TP_RULES:
        if path.endswith(suffix):
            return build(model_axis)
    return P()  # replicated (layernorm gamma/beta, etc.)


def _path_to_str(path) -> str:
    parts = []
    for k in path:
        if isinstance(k, jax.tree_util.GetAttrKey):
            parts.append(k.name)
        elif isinstance(k, jax.tree_util.SequenceKey):
            parts.append(str(k.idx))
        elif isinstance(k, jax.tree_util.DictKey):
            parts.append(str(k.key))
        else:
            parts.append(str(k))
    return ".".join(parts)


def sharding_tree(model: Any, mesh: Mesh, model_axis: str = MODEL_AXIS,
                  rule: Optional[Callable[[str], P]] = None) -> Any:
    """Model-shaped pytree of NamedShardings from the TP rules."""
    rule = rule or (lambda path: tp_spec_for(path, model_axis))

    def leaf_sharding(path, leaf):
        return NamedSharding(mesh, rule(_path_to_str(path)))

    return jax.tree_util.tree_map_with_path(leaf_sharding, model)


def shard_model(model: Any, mesh: Mesh, model_axis: str = MODEL_AXIS,
                rule: Optional[Callable[[str], P]] = None) -> Any:
    """Place every parameter on the mesh per the TP rules (device_put)."""
    return jax.device_put(model, sharding_tree(model, mesh, model_axis, rule))


def fsdp_spec_for(path: str, shape, mesh: Mesh,
                  data_axis: str = DATA_AXIS,
                  model_axis: str = MODEL_AXIS,
                  min_size: int = 2**14) -> P:
    """Compose the TP spec with ZeRO/FSDP sharding over the data axis.

    The GSPMD formulation of ZeRO-3: each parameter (and therefore, via
    ``zeros_like``, each Adam moment) is additionally partitioned over the
    *data* axis on its largest still-replicated dimension.  XLA then
    all-gathers the shard just before use in the forward/backward matmuls
    and reduce-scatters the gradients — the classic FSDP schedule, expressed
    purely as layout annotations with zero changes to the train step
    (scaling-book recipe; no reference analogue, single-GPU).

    Parameters smaller than ``min_size`` elements stay at their TP spec:
    gathering a tiny layernorm vector costs more in latency than its
    replication costs in HBM.
    """
    spec = tp_spec_for(path, model_axis)
    ndim = len(shape)
    dims = list(spec) + [None] * (ndim - len(spec))
    n = mesh.shape[data_axis]
    size = 1
    for d in shape:
        size *= int(d)

    def as_spec(dims):
        while dims and dims[-1] is None:  # P(None) != P() under ==
            dims.pop()
        return P(*dims)

    if n == 1 or size < min_size:
        return as_spec(dims)
    best = None
    for i in range(ndim):
        if dims[i] is not None:
            continue  # already TP-sharded
        if shape[i] % n:
            continue  # not divisible over the data axis
        if best is None or shape[i] > shape[best]:
            best = i
    if best is not None:
        dims[best] = data_axis
    return as_spec(dims)


def fsdp_sharding_tree(model: Any, mesh: Mesh,
                       data_axis: str = DATA_AXIS,
                       model_axis: str = MODEL_AXIS,
                       min_size: int = 2**14) -> Any:
    """Model-shaped pytree of NamedShardings under TP + FSDP rules."""

    def leaf_sharding(path, leaf):
        return NamedSharding(
            mesh, fsdp_spec_for(_path_to_str(path), leaf.shape, mesh,
                                data_axis, model_axis, min_size))

    return jax.tree_util.tree_map_with_path(leaf_sharding, model)


def apply_mesh(model: Module, mesh: Optional[Mesh],
               batch_axis: Optional[str] = DATA_AXIS,
               head_axis: Optional[str] = MODEL_AXIS,
               seq_axis: Optional[str] = None) -> Module:
    """Wire the mesh into every MultiHeadAttention so the Pallas kernel runs
    under shard_map (GSPMD cannot partition pallas_call directly).
    ``seq_axis`` selects sequence/context parallelism: attention goes
    through the differentiable ring (activations sharded over the sequence
    dim) instead of the head-sharded shim.

    Validates GQA head counts against the mesh up front: both ``n_head`` and
    ``n_kv_head`` must be divisible by the ``head_axis`` size, or the failure
    would otherwise surface as an opaque sharding-divisibility error deep in
    shard_map / device_put (e.g. an MQA model whose single KV head cannot be
    split over a TP axis)."""

    def wire(m: Any) -> Any:
        if isinstance(m, MultiHeadAttention):
            if mesh is not None and head_axis in mesh.axis_names:
                tp = mesh.shape[head_axis]
                if m.n_head % tp or m.n_kv_head % tp:
                    raise ValueError(
                        f"MultiHeadAttention(n_head={m.n_head}, "
                        f"n_kv_head={m.n_kv_head}) cannot be sharded over "
                        f"mesh axis {head_axis!r} of size {tp}: both head "
                        f"counts must be divisible by the axis size")
            return m.replace(mesh=mesh, mesh_batch_axis=batch_axis,
                             mesh_head_axis=head_axis,
                             mesh_seq_axis=seq_axis)
        return m

    from ..module import map_module_tree

    return map_module_tree(model, wire)
