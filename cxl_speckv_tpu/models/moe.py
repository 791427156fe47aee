"""Sparse mixture-of-experts MLP (Mixtral family), TPU-first.

The reference hosts its LLM externally (SURVEY.md §1: the vLLM backend is
the integration point, `host/python/vllm_speckv_backend.py`), so MoE here
is a model family the serving engine must host — attention/KV machinery is
untouched (experts only replace the dense SwiGLU MLP).

Router semantics match the hosted family exactly (config.moe_style):
- "mixtral" (HF `MixtralSparseMoeBlock`): softmax over ALL experts in
  float32, top-k selection, renormalize the selected weights.
- "gpt_oss" (HF `GptOssTopKRouter`/`GptOssExperts`): biased router logits,
  top-k on the LOGITS, softmax over just the selected values; experts use
  biased projections and the clamped gated activation
  glu = clamp(gate, max=limit) * sigmoid(1.702 * clamp(gate, max=limit)),
  out = (clamp(up, +-limit) + 1) * glu (alpha=1.702, limit=7.0).

Two compute modes, both static-shaped (no data-dependent shapes — XLA
traces one program) and both expert-parallel over the mesh "ep" axis purely
through GSPMD sharding annotations (the final combine einsum contracts the
expert axis, so XLA inserts the psum over "ep" automatically):

- "dense": every expert processes every token; the gate weights zero out
  non-selected experts in the combine. Decode-optimal: at decode batch
  sizes the MoE layer is bound by streaming ALL expert weights from HBM
  (every expert is hit by some lane), so skipping FLOPs saves nothing —
  and the dense form needs no gather/scatter at all.
- "dispatch": GShard-style capacity bucketing via one-hot dispatch
  matmuls. Each expert processes at most C = ceil(N*K/E * capacity_factor)
  tokens; prefill-optimal (FLOP-bound regime, compute drops from E× to
  ~K× the dense-MLP cost + O(N·E·C) dispatch). Tokens overflowing an
  expert's capacity lose that expert's contribution (that share of the
  output is simply zero) — the standard GShard/Switch drop semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cxl_speckv_tpu.models.configs import LlamaConfig
from cxl_speckv_tpu.ops.wquant import mm, qeinsum


def router_combine_weights(
    x2d: jax.Array, router_w: jax.Array, top_k: int,
    router_b: jax.Array | None = None, style: str = "mixtral",
    norm_topk: bool = True,
) -> jax.Array:
    """Per-token combine weights over all experts.

    x2d [N, H], router_w [H, E] -> [N, E] float32, with exactly `top_k`
    non-zero entries per row.
    - "mixtral": softmax over all experts, then top-k, then renormalize.
    - "gpt_oss": biased logits, top-k on the LOGITS, softmax over the
      selected values (HF GptOssTopKRouter).
    """
    logits = x2d.astype(jnp.float32) @ router_w.astype(jnp.float32)  # [N, E]
    if router_b is not None:
        logits = logits + router_b.astype(jnp.float32)
    if style == "gpt_oss":
        vals, idx = jax.lax.top_k(logits, top_k)                     # [N, K]
        vals = jax.nn.softmax(vals, axis=-1)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        vals, idx = jax.lax.top_k(probs, top_k)                      # [N, K]
        if norm_topk:   # Mixtral/Qwen3-MoE renorm; Qwen2-MoE keeps raw probs
            vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(idx, logits.shape[-1], dtype=jnp.float32)  # [N, K, E]
    return jnp.einsum("nke,nk->ne", onehot, vals)                    # [N, E]


def _shared_expert(x2d: jax.Array, lp) -> jax.Array:
    """Qwen2-MoE shared expert: a dense SwiGLU on EVERY token, scaled by
    sigmoid(x @ shared_expert_gate), added to the routed output. Zero when
    the params carry no shared-expert leaves."""
    if "shared_gate" not in lp:
        return jnp.zeros_like(x2d)
    h = jax.nn.silu(mm(x2d, lp["shared_gate"])) * mm(x2d, lp["shared_up"])
    out = mm(h, lp["shared_down"])
    scale = jax.nn.sigmoid(
        (x2d.astype(jnp.float32) @ lp["shared_expert_gate"]
         .astype(jnp.float32))[:, None])
    return out * scale.astype(out.dtype)


_GPT_OSS_ALPHA = 1.702
_GPT_OSS_LIMIT = 7.0


def _expert_ffn(xe: jax.Array, lp, style: str) -> jax.Array:
    """Batched-over-experts gated MLP. xe [E, C, H] -> [E, C, H].
    "mixtral": SwiGLU; "gpt_oss": biased projections + the clamped gated
    activation (HF GptOssExperts, alpha=1.702, limit=7.0)."""
    g = qeinsum("ech,ehi->eci", xe, lp["gate"])
    u = qeinsum("ech,ehi->eci", xe, lp["up"])
    if style == "gpt_oss":
        g = g + lp["gate_bias"][:, None, :]
        u = u + lp["up_bias"][:, None, :]
        g = jnp.minimum(g, _GPT_OSS_LIMIT)
        u = jnp.clip(u, -_GPT_OSS_LIMIT, _GPT_OSS_LIMIT)
        h = (u + 1.0) * (g * jax.nn.sigmoid(g * _GPT_OSS_ALPHA))
        return (qeinsum("eci,eih->ech", h, lp["down"])
                + lp["down_bias"][:, None, :])
    return qeinsum("eci,eih->ech", jax.nn.silu(g) * u, lp["down"])


def moe_ffn(
    x2d: jax.Array,          # [N, H]
    lp,                      # layer params: router [H, E], gate/up [E, H, I],
                             # down [E, I, H] (+ gpt_oss bias leaves)
    config: LlamaConfig,
) -> jax.Array:
    """Sparse-MoE MLP over a flat token batch. Returns [N, H] in x2d.dtype."""
    c = config
    E = lp["gate"].shape[0]
    N = x2d.shape[0]
    cw = router_combine_weights(x2d, lp["router"], c.num_experts_per_tok,
                                lp.get("router_bias"), c.moe_style,
                                c.moe_norm_topk)

    if c.moe_impl == "dense":
        # all experts on all tokens; combine contracts E (psum over "ep")
        ye = _expert_ffn(
            jnp.broadcast_to(x2d[None], (E, N, x2d.shape[1])),
            lp, c.moe_style)                                     # [E, N, H]
        out = jnp.einsum("ne,enh->nh", cw.astype(ye.dtype), ye)
        return (out + _shared_expert(x2d, lp)).astype(x2d.dtype)

    if c.moe_impl != "dispatch":
        raise ValueError(f"unknown moe_impl {c.moe_impl!r}")

    # --- capacity-bucketed one-hot dispatch ------------------------------
    # static capacity per expert; cf >= E/K means no token can ever drop
    cap = int(-(-N * c.num_experts_per_tok * c.moe_capacity_factor // E))
    cap = max(1, min(cap, N))
    selected = cw > 0                                            # [N, E]
    # arrival-order position of each (token, expert) pair in e's bucket
    pos = jnp.cumsum(selected.astype(jnp.int32), axis=0) - 1      # [N, E]
    pos = jnp.where(selected & (pos < cap), pos, cap)             # cap = drop
    disp = jax.nn.one_hot(pos, cap, dtype=x2d.dtype)              # [N, E, C]
    xe = jnp.einsum("nec,nh->ech", disp, x2d)                     # [E, C, H]
    ye = _expert_ffn(xe, lp, c.moe_style)                         # [E, C, H]
    comb = disp.astype(jnp.float32) * cw[..., None]               # [N, E, C]
    out = jnp.einsum("nec,ech->nh", comb.astype(ye.dtype), ye)
    return (out + _shared_expert(x2d, lp)).astype(x2d.dtype)
