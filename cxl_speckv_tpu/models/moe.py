"""Sparse mixture-of-experts MLP (Mixtral family), TPU-first.

The reference hosts its LLM externally (SURVEY.md §1: the vLLM backend is
the integration point, `host/python/vllm_speckv_backend.py`), so MoE here
is a model family the serving engine must host — attention/KV machinery is
untouched (experts only replace the dense SwiGLU MLP).

Router semantics match HF `MixtralSparseMoeBlock` exactly: softmax over all
experts in float32, top-k selection, renormalize the selected weights.

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


def router_combine_weights(
    x2d: jax.Array, router_w: jax.Array, top_k: int
) -> jax.Array:
    """Per-token combine weights over all experts.

    x2d [N, H], router_w [H, E] -> [N, E] float32, with exactly `top_k`
    non-zero entries per row, renormalized to sum to 1 (HF Mixtral:
    softmax first, then top-k, then renormalize).
    """
    logits = x2d.astype(jnp.float32) @ router_w.astype(jnp.float32)  # [N, E]
    probs = jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(probs, top_k)                          # [N, K]
    vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(idx, probs.shape[-1], dtype=jnp.float32)  # [N, K, E]
    return jnp.einsum("nke,nk->ne", onehot, vals)                    # [N, E]


def _expert_ffn(xe: jax.Array, w_gate, w_up, w_down) -> jax.Array:
    """Batched-over-experts SwiGLU. xe [E, C, H] -> [E, C, H]."""
    h = jax.nn.silu(jnp.einsum("ech,ehi->eci", xe, w_gate))
    u = jnp.einsum("ech,ehi->eci", xe, w_up)
    return jnp.einsum("eci,eih->ech", h * u, w_down)


def moe_ffn(
    x2d: jax.Array,          # [N, H]
    router_w: jax.Array,     # [H, E]
    w_gate: jax.Array,       # [E, H, I]
    w_up: jax.Array,         # [E, H, I]
    w_down: jax.Array,       # [E, I, H]
    config: LlamaConfig,
) -> jax.Array:
    """Sparse-MoE MLP over a flat token batch. Returns [N, H] in x2d.dtype."""
    c = config
    E = w_gate.shape[0]
    N = x2d.shape[0]
    cw = router_combine_weights(x2d, router_w, c.num_experts_per_tok)

    if c.moe_impl == "dense":
        # all experts on all tokens; combine contracts E (psum over "ep")
        ye = _expert_ffn(
            jnp.broadcast_to(x2d[None], (E, N, x2d.shape[1])),
            w_gate, w_up, w_down)                                # [E, N, H]
        out = jnp.einsum("ne,enh->nh", cw.astype(ye.dtype), ye)
        return out.astype(x2d.dtype)

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
    ye = _expert_ffn(xe, w_gate, w_up, w_down)                    # [E, C, H]
    comb = disp.astype(jnp.float32) * cw[..., None]               # [N, E, C]
    out = jnp.einsum("nec,ech->nh", comb.astype(ye.dtype), ye)
    return out.astype(x2d.dtype)
