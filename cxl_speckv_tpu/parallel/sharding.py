"""TP/DP sharding rules for params, KV pools, and activations.

Megatron-style tensor parallelism expressed as GSPMD annotations (XLA
inserts the ICI collectives):

- attention/MLP "column" weights (q/k/v/gate/up) shard the output-feature
  axis over "tp"; "row" weights (o/down) shard the input-feature axis —
  one all-reduce per block, emitted automatically after the row matmuls
- KV pools shard the kv-head axis over "tp": each chip holds its heads'
  slice of every block, so block migration is chip-local (the host store
  is per-host anyway) and paged attention needs no cross-chip traffic
  (q heads are grouped kv-head-major, so the q shard matches)
- embed/lm_head shard the vocab axis; batch lanes shard over "dp"

Head-count divisibility: num_kv_heads % tp == 0 is required (8 kv heads →
tp up to 8 on Llama-3-8B/70B, matching v5e-8 / 2-host v5e-16 with dp=2).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cxl_speckv_tpu.models.configs import LlamaConfig


def param_specs(config: LlamaConfig) -> dict[str, Any]:
    """PartitionSpec pytree matching `models.llama.init_params` layout."""
    specs = {
        "embed": P("tp", None),          # vocab-sharded
        "layers": {
            "attn_norm": P(None, None),
            "q": P(None, None, "tp"),
            "k": P(None, None, "tp"),
            "v": P(None, None, "tp"),
            "o": P(None, "tp", None),
            "mlp_norm": P(None, None),
            "gate": P(None, None, "tp"),
            "up": P(None, None, "tp"),
            "down": P(None, "tp", None),
        },
        "final_norm": P(None),
    }
    if config.num_experts > 0:
        # Mixtral MoE: experts shard over "ep", each expert's FFN over "tp"
        # (column gate/up, row down — same megatron split as the dense MLP).
        # The combine einsum contracts the expert axis, so GSPMD inserts the
        # psum over "ep" after local-expert compute; the router is tiny and
        # replicated.
        specs["layers"]["router"] = P(None, None, None)
        specs["layers"]["gate"] = P(None, "ep", None, "tp")
        specs["layers"]["up"] = P(None, "ep", None, "tp")
        specs["layers"]["down"] = P(None, "ep", "tp", None)
        if config.moe_shared_expert > 0:
            # dense megatron split like the main MLP; the scalar gate is
            # replicated
            specs["layers"]["shared_gate"] = P(None, None, "tp")
            specs["layers"]["shared_up"] = P(None, None, "tp")
            specs["layers"]["shared_down"] = P(None, "tp", None)
            specs["layers"]["shared_expert_gate"] = P(None, None)
        if config.moe_style == "gpt_oss":
            # biased router stays replicated; expert biases follow their
            # projection's output axis (down_bias is added once per expert
            # AFTER the tp psum, so it is tp-replicated)
            specs["layers"]["router_bias"] = P(None, None)
            specs["layers"]["gate_bias"] = P(None, "ep", "tp")
            specs["layers"]["up_bias"] = P(None, "ep", "tp")
            specs["layers"]["down_bias"] = P(None, "ep", None)
    # optional per-family leaves mirror init_params' conditions
    if config.attn_bias:
        specs["layers"]["q_bias"] = P(None, "tp")
        specs["layers"]["k_bias"] = P(None, "tp")
        specs["layers"]["v_bias"] = P(None, "tp")
    if config.qk_norm:
        specs["layers"]["q_norm"] = P(None, None)
        specs["layers"]["k_norm"] = P(None, None)
    if config.attn_sinks:
        specs["layers"]["sinks"] = P(None, "tp")   # per-q-head, like q cols
    if config.o_bias:
        # o is row-parallel (psum over tp); its bias is added once, after
        specs["layers"]["o_bias"] = P(None, None)
    if config.post_norms:
        specs["layers"]["post_attn_norm"] = P(None, None)
        specs["layers"]["post_mlp_norm"] = P(None, None)
    if not config.tie_embeddings:
        specs["lm_head"] = P(None, "tp")
    return specs


def pool_specs() -> tuple:
    """(k_pool, v_pool, k_scale, v_scale) specs: kv-head axis over tp.

    K pool is TRANSPOSED [L, S, D/pack, Hkv*bs] (r3 kT layout) — its
    head-major column axis shards over tp, each shard holding its heads'
    contiguous columns. V pools are [L, S, Hkv, bs, D/pack]; scales
    are flat kT-order columns [L, S, 1, Hkv*bs].
    """
    kt = P(None, None, None, "tp")
    kv = P(None, None, "tp", None, None)
    sc = P(None, None, None, "tp")   # flat [L, S, 1, Hkv*bs], kT-order
    return kt, kv, sc, sc


def param_shardings(config: LlamaConfig, mesh: Mesh, params=None):
    """NamedSharding tree for the params. Pass the actual `params` when they
    may be weight-quantized (`ops.wquant`): QuantizedTensor leaves get a
    matching (q, s) sharding node — q keeps the weight's spec, s keeps it
    with the reduced axis unsharded."""
    specs = param_specs(config)
    if params is not None:
        from cxl_speckv_tpu.ops.wquant import quantize_specs
        specs = quantize_specs(specs, params)
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P))


def pool_shardings(mesh: Mesh):
    return tuple(NamedSharding(mesh, s) for s in pool_specs())


def shard_params(params, config: LlamaConfig, mesh: Mesh):
    return jax.device_put(params, param_shardings(config, mesh, params))


def shard_pools(pools, mesh: Mesh):
    return tuple(jax.device_put(p, s) for p, s in zip(pools, pool_shardings(mesh)))


def pool_put(mesh: Mesh):
    """device_put function for TieredKVCache pool arrays. kT pools and
    scales are both ndim-4, so the role is explicit: "kt" | "v" | "sc"
    (single-device callers pass a device_put that ignores it)."""
    kt_s, kv_s, sc_s, _ = pool_shardings(mesh)

    def put(x, role="v"):
        if role == "kt":
            return jax.device_put(x, kt_s)
        if role == "sc" or x.ndim == 4:
            return jax.device_put(x, sc_s)
        return jax.device_put(x, kv_s)

    return put


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


_REPLICATORS: dict = {}


def host_fetch(arr, mesh: Mesh | None = None):
    """np.asarray that also works under a MULTI-PROCESS global mesh.

    A dp/tp-sharded program output spans non-addressable devices there, so
    `np.asarray` would raise; replicate it over the mesh first (one
    allgather on the inter-process fabric — Gloo on CPU, DCN on a pod) via
    a cached jitted identity, then pull to host. Single-process arrays (and
    plain numpy/python inputs) take the direct path with zero overhead.
    """
    import numpy as np

    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        if arr.sharding.is_fully_replicated:
            return np.asarray(arr)
        if mesh is None:
            raise ValueError(
                "host_fetch of a non-addressable sharded array needs the mesh")
        rep = _REPLICATORS.get(mesh)
        if rep is None:
            rep = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))
            _REPLICATORS[mesh] = rep
        arr = rep(arr)
    return np.asarray(arr)


def tp_compatible(config: LlamaConfig, tp: int) -> bool:
    """True when every tp-sharded parameter axis of this config divides tp —
    the condition for sharding a model's weights/pools over the mesh. The
    engine uses it to decide whether a DRAFT model shards with the target or
    stays replicated (a tiny draft with few heads is legitimately served
    replicated; the target must pass `validate_tp` outright)."""
    c = config
    dims = [c.num_kv_heads, c.num_q_heads, c.intermediate_size, c.vocab_size]
    return all(d % tp == 0 for d in dims)


def validate_tp(config: LlamaConfig, tp: int, ep: int = 1) -> None:
    if config.num_kv_heads % tp:
        raise ValueError(
            f"num_kv_heads={config.num_kv_heads} not divisible by tp={tp}")
    if config.num_q_heads % tp:
        raise ValueError(
            f"num_q_heads={config.num_q_heads} not divisible by tp={tp}")
    if ep > 1 and (config.num_experts == 0 or config.num_experts % ep):
        raise ValueError(
            f"num_experts={config.num_experts} not divisible by ep={ep}")
