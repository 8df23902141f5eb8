"""Parameter/batch sharding rules (NamedSharding partition specs).

Params are flat dicts of ``{torch-dotted-name: array}`` (see models/layers.py)
so partitioning is a name-pattern + shape rule, not a module-tree traversal:

  * conv/linear weights whose output-channel dim divides the ``tp`` axis and
    is large enough to be worth sharding -> sharded over ``tp`` on that dim
    (Megatron-style column parallel; XLA inserts the all-gathers/reduces at
    layer boundaries under GSPMD);
  * codebooks, norms, biases of small layers -> replicated;
  * batch ("dp") sharding for activations.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: below this many output channels, sharding costs more than it saves
_MIN_SHARD_DIM = 256


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 (batch) over dp; replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def _spec_for(name: str, shape: tuple[int, ...], tp: int) -> P:
    if tp <= 1:
        return P()
    if "codebook" in name:
        return P()  # codebooks are tiny and read by every shard
    if len(shape) == 3 and name.endswith(".weight"):
        # conv [K, I/g, O]: column-parallel over O
        if shape[2] % tp == 0 and shape[2] >= _MIN_SHARD_DIM:
            return P(None, None, "tp")
        return P()
    if len(shape) == 2 and name.endswith(".weight"):
        # linear [in, out]: column-parallel over out
        if shape[1] % tp == 0 and shape[1] >= _MIN_SHARD_DIM:
            return P(None, "tp")
        return P()
    if len(shape) == 1 and name.endswith(".bias"):
        if shape[0] % tp == 0 and shape[0] >= _MIN_SHARD_DIM:
            return P("tp")
        return P()
    return P()


def param_shardings(mesh: Mesh, params: dict[str, jax.Array]) -> dict[str, NamedSharding]:
    """NamedSharding per parameter according to the tp rules above."""
    tp = mesh.shape.get("tp", 1)
    return {
        name: NamedSharding(mesh, _spec_for(name, tuple(arr.shape), tp))
        for name, arr in params.items()
    }


def shard_params(mesh: Mesh, params: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """Place parameters onto the mesh according to their shardings."""
    shardings = param_shardings(mesh, params)
    return {name: jax.device_put(arr, shardings[name]) for name, arr in params.items()}


def dia_param_shardings(mesh: Mesh, params: dict[str, jax.Array],
                        min_dim: int = 2) -> dict[str, NamedSharding]:
    """Megatron-style specs for the Dia transformer's DenseGeneral kernels.

    Attention q/k/v kernels [D, H, Dh] shard the head dim; o_proj [H, Dh, D]
    reduces over heads (row-parallel — XLA inserts the psum); the gated MLP
    shards the intermediate dim on wi_fused [D, 2, I] and reduces on
    wo [I, D]. Embeddings/norms/logits stay replicated.
    """
    tp = mesh.shape.get("tp", 1)
    out: dict[str, NamedSharding] = {}
    for name, arr in params.items():
        spec = P()
        if tp > 1:
            if name.endswith(("q_proj.weight", "k_proj.weight", "v_proj.weight")) \
                    and arr.ndim == 3 and arr.shape[1] % tp == 0 \
                    and arr.shape[1] >= min_dim:
                spec = P(None, "tp", None)
            elif name.endswith("o_proj.weight") and arr.ndim == 3 \
                    and arr.shape[0] % tp == 0 and arr.shape[0] >= min_dim:
                spec = P("tp", None, None)
            elif name.endswith("wi_fused.weight") and arr.ndim == 3 \
                    and arr.shape[2] % tp == 0:
                spec = P(None, None, "tp")
            elif name.endswith("wo.weight") and arr.ndim == 2 \
                    and arr.shape[0] % tp == 0:
                spec = P("tp", None)
            # Weight-only quantized kernels. int8 keeps the original kernel
            # ndim (same specs apply to data; per-output scales shard with
            # their output dims or replicate when the sharded dim collapsed
            # to 1). int4 stores flat [K/2, N] nibbles + [K/G, N] group
            # scales: column-parallel layers shard N (whole heads land on
            # one shard because head dims divide tp); row-parallel layers
            # (o_proj/wo contract the sharded activation) shard the packed
            # K rows — group scales follow iff tp divides their K/G rows.
            elif name.endswith(("q_proj.weight_q8", "k_proj.weight_q8",
                                "v_proj.weight_q8")) and arr.ndim == 3 \
                    and arr.shape[1] % tp == 0 and arr.shape[1] >= min_dim:
                spec = P(None, "tp", None)
            elif name.endswith(("q_proj.weight_scale", "k_proj.weight_scale",
                                "v_proj.weight_scale")) and arr.ndim == 3 \
                    and arr.shape[1] % tp == 0 and arr.shape[1] >= min_dim:
                spec = P(None, "tp", None)
            elif name.endswith("o_proj.weight_q8") and arr.ndim == 3 \
                    and arr.shape[0] % tp == 0 and arr.shape[0] >= min_dim:
                spec = P("tp", None, None)
            elif name.endswith("wi_fused.weight_q8") and arr.ndim == 3 \
                    and arr.shape[2] % tp == 0:
                spec = P(None, None, "tp")
            elif name.endswith("wi_fused.weight_scale") and arr.ndim == 3 \
                    and arr.shape[2] % tp == 0:
                spec = P(None, None, "tp")
            elif name.endswith("wo.weight_q8") and arr.ndim == 2 \
                    and arr.shape[0] % tp == 0:
                spec = P("tp", None)
            elif name.endswith(("q_proj.weight_q4", "k_proj.weight_q4",
                                "v_proj.weight_q4", "q_proj.weight_scale4",
                                "k_proj.weight_scale4",
                                "v_proj.weight_scale4")) \
                    and arr.ndim == 2 and arr.shape[1] % tp == 0 \
                    and arr.shape[1] >= min_dim:
                spec = P(None, "tp")
            elif name.endswith(("o_proj.weight_q4", "o_proj.weight_scale4",
                                "wo.weight_q4", "wo.weight_scale4")) \
                    and arr.ndim == 2 and arr.shape[0] % tp == 0 \
                    and arr.shape[0] >= min_dim:
                spec = P("tp", None)
            # wi_fused q4/scale4 flatten (2, I) into one N axis: sharding N
            # contiguously would split gate|up ACROSS shards (flat index
            # c*I + i), so they stay replicated — the bytes are already
            # quartered, and the wi dot reads x replicated anyway.
        out[name] = NamedSharding(mesh, spec)
    return out
