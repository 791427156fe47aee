"""Llama-family model: functional JAX forward over the paged quantized KV cache.

Pure-pytree parameters (no flax module state), layer weights stacked on a
leading axis and iterated with `lax.scan` so an 80-layer model traces as one
loop — compiler-friendly control flow, constant compile time in depth.

Numerics follow the HF `LlamaForCausalLM` conventions exactly (rotate-half
RoPE on the full head dim, frequency-banded Llama-3 rope scaling, RMSNorm in
float32) so converted checkpoints are logit-compatible — verified by
`tests/test_model.py` against transformers.

Two attention paths share one signature:
- dense prefill attention over the fresh chunk (+ quantized pool context),
- paged decode attention over the quantized block pools
  (`ops/paged_attention.py` Pallas kernel on TPU, jnp reference elsewhere).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.models.configs import LlamaConfig
from cxl_speckv_tpu.ops.paged_attention import paged_attention
from cxl_speckv_tpu.ops.paged_attention_ref import paged_attention_ref
from cxl_speckv_tpu.ops.quant import (
    encode_for_pool,
    dequantize_dual,
    quantize_kv,
    quantize_kv_dual,
    scheme_id_table,
)
from cxl_speckv_tpu.ops.wquant import mm, take_rows

Params = dict[str, Any]


def _kt_append(kp: jax.Array, kenc: jax.Array, slots: jax.Array,
               offs: jax.Array, bs: int) -> jax.Array:
    """Scatter encoded K rows [..., Hkv, D/pack] into the TRANSPOSED K pool
    [S, D/pack, Hkv*bs] at (slot, :, h*bs + off); slots/offs carry the same
    leading dims as kenc ([B] decode, [B, T] batched prefill). The INT4
    half-split pairing is layout-invariant: `encode_for_pool` lane i holds
    elements (i, i+D/2), which is exactly kT sublane i of the token's
    column."""
    hkv = kenc.shape[-2]
    cols = offs[..., None] + jnp.arange(hkv, dtype=offs.dtype) * bs
    return kp.at[slots[..., None], :, cols].set(kenc.astype(kp.dtype))


def _sc_append(sc: jax.Array, vals: jax.Array, slots: jax.Array,
               offs: jax.Array, bs: int) -> jax.Array:
    """Scatter per-token scales [..., Hkv] into the FLAT scale pool
    [S, 1, Hkv*bs] at (slot, 0, h*bs + off) — the scale pool stores
    head-major columns like kT, so kernels read per-column scale vectors
    as natural [1, cols] tiles (a [Hkv, bs] -> [1, cols] in-kernel shape
    cast is not Mosaic-lowerable at sub-tile sizes)."""
    hkv = vals.shape[-1]
    cols = offs[..., None] + jnp.arange(hkv, dtype=offs.dtype) * bs
    return sc.at[slots[..., None], 0, cols].set(vals)


def _attend_fns(config: LlamaConfig, use_pallas: bool, mesh):
    """(decode_attend, chunk_attend) for one traced program.

    Pallas kernels when `use_pallas` — wrapped in `shard_map` under a mesh
    (`parallel/shard_kernels.py`: kv-head/tp + lane/dp decomposition, zero
    cross-chip traffic) so mesh serving runs the SAME flagship kernels as
    single-chip serving; otherwise the GSPMD-partitionable jnp references.
    """
    from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention
    from cxl_speckv_tpu.ops.chunk_attention_pallas import (
        paged_chunk_attention_pallas)

    if not use_pallas:
        return paged_attention_ref, paged_chunk_attention
    cd = jnp.dtype(config.attn_compute_dtype)
    if mesh is not None:
        from cxl_speckv_tpu.parallel.shard_kernels import (
            sharded_chunk_attention, sharded_paged_attention)

        return (sharded_paged_attention(mesh, compute_dtype=cd),
                sharded_chunk_attention(mesh, compute_dtype=cd))
    return (functools.partial(paged_attention, compute_dtype=cd),
            functools.partial(paged_chunk_attention_pallas, compute_dtype=cd))


# ---------------------------------------------------------------------------
# parameter init / structure
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("config", "dtype"))
def init_params(config: LlamaConfig, key: jax.Array, dtype=None) -> Params:
    """Random-init parameters with the canonical tree layout:

    embed    [V, H]
    layers   dict of stacked [L, ...] leaves:
        attn_norm [L, H], q [L, H, Hq*D], k [L, H, Hkv*D], v [L, H, Hkv*D],
        o [L, Hq*D, H], mlp_norm [L, H], gate [L, H, I], up [L, H, I],
        down [L, I, H]
    final_norm [H]
    lm_head  [H, V] (absent when tie_embeddings)
    """
    c = config
    dtype = dtype or jnp.dtype(c.dtype)
    keys = iter(jax.random.split(key, 24))
    L, H, I, V = c.num_layers, c.hidden_size, c.intermediate_size, c.vocab_size
    qd, kvd = c.num_q_heads * c.head_dim, c.num_kv_heads * c.head_dim

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5).astype(dtype)

    params: Params = {
        "embed": w(next(keys), (V, H), H),
        "layers": {
            "attn_norm": jnp.ones((L, H), dtype),
            "q": w(next(keys), (L, H, qd), H),
            "k": w(next(keys), (L, H, kvd), H),
            "v": w(next(keys), (L, H, kvd), H),
            "o": w(next(keys), (L, qd, H), qd),
            "mlp_norm": jnp.ones((L, H), dtype),
            "gate": w(next(keys), (L, H, I), H),
            "up": w(next(keys), (L, H, I), H),
            "down": w(next(keys), (L, I, H), I),
        },
        "final_norm": jnp.ones((H,), dtype),
    }
    if c.num_experts > 0:
        # Mixtral-family MoE: the dense gate/up/down grow a leading expert
        # axis and a router projection joins (routing math itself runs in
        # f32, models/moe.py).
        E = c.num_experts
        params["layers"]["router"] = w(next(keys), (L, H, E), H)
        params["layers"]["gate"] = w(next(keys), (L, E, H, I), H)
        params["layers"]["up"] = w(next(keys), (L, E, H, I), H)
        params["layers"]["down"] = w(next(keys), (L, E, I, H), I)
        if c.moe_shared_expert > 0:
            # Qwen2-MoE sigmoid-gated shared expert (dense SwiGLU on every
            # token, its own intermediate size)
            Is = c.moe_shared_expert
            params["layers"]["shared_gate"] = w(next(keys), (L, H, Is), H)
            params["layers"]["shared_up"] = w(next(keys), (L, H, Is), H)
            params["layers"]["shared_down"] = w(next(keys), (L, Is, H), Is)
            params["layers"]["shared_expert_gate"] = w(next(keys), (L, H), H)
        if c.moe_style == "gpt_oss":
            # GPT-OSS: biased router + biased expert projections. Random
            # init so tests exercise every bias path.
            def b(shape, scale=0.05):
                return (jax.random.normal(next(keys), shape, jnp.float32)
                        * scale).astype(dtype)
            params["layers"]["router_bias"] = b((L, E))
            params["layers"]["gate_bias"] = b((L, E, I))
            params["layers"]["up_bias"] = b((L, E, I))
            params["layers"]["down_bias"] = b((L, E, H))
    if c.attn_bias:
        # Qwen2-family bias on q/k/v only (o/mlp bias-free, matching HF).
        # Random init is non-zero so tests exercise the bias path.
        for name, width in (("q_bias", qd), ("k_bias", kvd), ("v_bias", kvd)):
            params["layers"][name] = (
                jax.random.normal(next(keys), (L, width), jnp.float32) * 0.02
            ).astype(dtype)
    if c.attn_sinks:
        # GPT-OSS learned per-head sink logits (softmax denominator term)
        params["layers"]["sinks"] = (
            jax.random.normal(next(keys), (L, c.num_q_heads), jnp.float32)
            * 0.5).astype(dtype)
    if c.o_bias:
        params["layers"]["o_bias"] = (
            jax.random.normal(next(keys), (L, H), jnp.float32) * 0.02
        ).astype(dtype)
    if c.qk_norm:
        # Qwen3-family per-head q/k RMSNorm (weight [head_dim]). Random
        # init (not ones) so tests exercise the path.
        for name in ("q_norm", "k_norm"):
            params["layers"][name] = (
                1.0 + jax.random.normal(next(keys), (L, c.head_dim),
                                        jnp.float32) * 0.1
            ).astype(dtype)
    if c.post_norms:
        # Gemma-2 sandwich norms (HF post_attention_layernorm /
        # post_feedforward_layernorm; attn_norm/mlp_norm are the pre-norms).
        # Random init (not the 0/1 identity) so tests exercise the path.
        for name in ("post_attn_norm", "post_mlp_norm"):
            params["layers"][name] = (
                jax.random.normal(next(keys), (L, H), jnp.float32) * 0.05
            ).astype(dtype)
    if not c.tie_embeddings:
        params["lm_head"] = w(next(keys), (H, V), H)
    return params


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def init_params_quantized(config: LlamaConfig, key: jax.Array,
                          bits: int = 8) -> Params:
    """Random-init directly into W8A16/W4A16 `QuantizedTensor` storage,
    never materializing the full-precision tree.

    Why this exists: the north-star model scale (BASELINE.md, Llama-3-8B)
    has ~16 GB of bf16 params — `init_params` + `quantize_weights` would
    need full-precision AND quantized copies live at once, which cannot fit
    a 16 GB v5e HBM. Here the layer stack is built by `jax.lax.map` over
    layer indices: each iteration draws ONE layer's weights in f32
    (~0.9 GB peak at 8B), quantizes them in-register, and writes only the
    int8 (+ per-out-channel f32 scale) slices into the stacked output
    buffers — peak HBM = quantized tree + one layer of f32 intermediates.
    `QuantizedTensor` is a pytree node with a NEGATIVE scale axis, so
    scan-stacking its (q, s) children yields exactly the stacked-layer
    quantized layout `quantize_weights` produces.

    Same tree layout as `init_params` (different random draws — both are
    random-weight inits). Dense + attn_bias + qk_norm configs only; MoE
    trees stay on the `init_params` -> `quantize_weights` path (expert
    leaves are the model's whole size — quantize them at conversion time).
    """
    from cxl_speckv_tpu.ops.wquant import quantize_tensor

    c = config
    if c.num_experts > 0:
        raise NotImplementedError(
            "init_params_quantized covers dense configs; quantize MoE "
            "params at conversion time (ops/wquant.quantize_weights)")
    dtype = jnp.dtype(c.dtype)
    L, H, I, V = c.num_layers, c.hidden_size, c.intermediate_size, c.vocab_size
    qd, kvd = c.num_q_heads * c.head_dim, c.num_kv_heads * c.head_dim

    @functools.partial(jax.jit, static_argnames=("shape", "axis", "b"))
    def _qw(k, shape, fan_in, axis=-2, b=bits):
        wf = jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5
        return quantize_tensor(wf, axis=axis, bits=b)

    @jax.jit
    def _layers(key):
        def one(i):
            lk = jax.random.fold_in(key, i)
            ks = iter(jax.random.split(lk, 8))
            def w(shape, fan_in):
                wf = (jax.random.normal(next(ks), shape, jnp.float32)
                      * fan_in**-0.5)
                return quantize_tensor(wf, axis=-2, bits=bits)
            out = {
                "q": w((H, qd), H), "k": w((H, kvd), H), "v": w((H, kvd), H),
                "o": w((qd, H), qd), "gate": w((H, I), H), "up": w((H, I), H),
                "down": w((I, H), I),
            }
            if c.attn_bias:
                bk = iter(jax.random.split(jax.random.fold_in(lk, 1), 3))
                for name, width in (("q_bias", qd), ("k_bias", kvd),
                                    ("v_bias", kvd)):
                    out[name] = (jax.random.normal(next(bk), (width,),
                                 jnp.float32) * 0.02).astype(dtype)
            if c.qk_norm:
                nk = iter(jax.random.split(jax.random.fold_in(lk, 2), 2))
                for name in ("q_norm", "k_norm"):
                    out[name] = (1.0 + jax.random.normal(
                        next(nk), (c.head_dim,), jnp.float32) * 0.1
                    ).astype(dtype)
            return out
        stacked = jax.lax.map(one, jnp.arange(L))
        stacked["attn_norm"] = jnp.ones((L, H), dtype)
        stacked["mlp_norm"] = jnp.ones((L, H), dtype)
        return stacked

    params: Params = {
        # embedding: per-ROW int8 (serves gather + tied head; stays int8
        # even at bits=4 — see quantize_weights)
        "embed": _qw(jax.random.fold_in(key, 101), (V, H), H, axis=-1, b=8),
        "layers": _layers(key),
        "final_norm": jnp.ones((H,), dtype),
    }
    if not c.tie_embeddings:
        params["lm_head"] = _qw(jax.random.fold_in(key, 102), (H, V), H)
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float,
             offset: float = 0.0) -> jax.Array:
    """RMSNorm; offset=1.0 gives the Gemma convention (zero-init weights,
    multiply by 1 + w)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * (weight + offset) if offset else normed * weight


def _norm(x: jax.Array, weight: jax.Array, config: LlamaConfig) -> jax.Array:
    return rms_norm(x, weight, config.rms_eps,
                    1.0 if config.norm_offset else 0.0)


def _soft_cap(x: jax.Array, cap: float | None) -> jax.Array:
    """Gemma-2 tanh softcapping (static no-op when cap is None)."""
    return x if cap is None else cap * jnp.tanh(x / cap)


def _embed(params: Params, config: LlamaConfig, token_ids: jax.Array):
    x = take_rows(params["embed"], token_ids, dtype=jnp.dtype(config.dtype))
    if config.embed_scale:
        x = x * jnp.asarray(config.hidden_size**0.5, x.dtype)
    return x


def _final_logits(x: jax.Array, params: Params, config: LlamaConfig):
    head = params["embed"].T if config.tie_embeddings else params["lm_head"]
    return _soft_cap(mm(x, head).astype(jnp.float32), config.final_softcap)


def _scan_layers(step, carry, layers, config: LlamaConfig,
                 with_output: bool = False):
    """Scan the stacked layer weights with per-layer STATIC attention
    windows. `step(carry, lp, li, window) -> carry` (or `(carry, y)` with
    `with_output`, ys stacked [L, ...] in layer order).

    Uniform models scan one layer per iteration. Models with an
    alternating local/global pattern (Gemma-2 `attn_pattern`) scan one
    pattern-PERIOD per iteration with each sub-layer's window baked
    statically into the (period-times unrolled) body — attention kernels
    keep static windows (and their DMA-elision index maps) at constant
    compile time in depth."""
    wins = config.layer_windows()
    L = config.num_layers
    if len(set(wins)) <= 1:
        def body(c2, xs):
            lp, li = xs
            out = step(c2, lp, li, wins[0] if wins else None)
            return out if with_output else (out, None)
        c2, ys = jax.lax.scan(body, carry, (layers, jnp.arange(L)))
        return (c2, ys) if with_output else c2

    period = len(config.attn_pattern)
    if L % period:
        raise ValueError(
            f"num_layers={L} not divisible by attn_pattern period {period}")
    grouped = jax.tree.map(
        lambda a: a.reshape(L // period, period, *a.shape[1:]), layers)
    idx = jnp.arange(L).reshape(L // period, period)

    def body(c2, xs):
        lps, lis = xs
        ys = []
        for j in range(period):
            lp = jax.tree.map(lambda a, j=j: a[j], lps)
            out = step(c2, lp, lis[j], wins[j])
            c2, y = out if with_output else (out, None)
            ys.append(y)
        stacked = (jax.tree.map(lambda *a: jnp.stack(a), *ys)
                   if with_output else None)
        return c2, stacked

    c2, ys = jax.lax.scan(body, carry, (grouped, idx))
    if not with_output:
        return c2
    # [L/period, period, ...] -> [L, ...]
    ys = jax.tree.map(lambda a: a.reshape(L, *a.shape[2:]), ys)
    return c2, ys


def rope_frequencies(config: LlamaConfig, theta: float | None = None) -> jax.Array:
    """Inverse frequencies [D/2], with Llama-3 banded scaling or linear
    (position-interpolation) scaling (HF-compatible). `theta` overrides
    `rope_theta` WITHOUT scaling — the Gemma-3 local-layer convention
    (rope_local_base_freq applies unscaled to sliding layers)."""
    c = config
    if theta is not None:
        return 1.0 / (theta ** (jnp.arange(0, c.head_dim, 2,
                                           dtype=jnp.float32) / c.head_dim))
    inv = 1.0 / (c.rope_theta ** (jnp.arange(0, c.head_dim, 2, dtype=jnp.float32) / c.head_dim))
    if c.rope_yarn is not None:
        # YaRN (HF _compute_yarn_parameters): interpolate between the
        # factor-scaled and unscaled frequencies with a per-dim linear ramp
        # between the beta_fast/beta_slow correction dims. The cos/sin
        # attention factor is folded into config.sm_scale (factor**2).
        import math
        y = c.rope_yarn
        D = c.head_dim

        def corr_dim(rot):
            return (D * math.log(y.original_max_position
                                 / (rot * 2 * math.pi))) / (2 * math.log(c.rope_theta))
        low, high = corr_dim(y.beta_fast), corr_dim(y.beta_slow)
        if y.truncate:
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, D - 1)
        if low == high:
            high += 0.001
        ramp = jnp.clip((jnp.arange(D // 2, dtype=jnp.float32) - low)
                        / (high - low), 0, 1)
        extrap = 1.0 - ramp   # 1 near low dims (high freq): keep unscaled
        inv = (inv / y.factor) * (1 - extrap) + inv * extrap
        return inv
    if c.rope_linear_factor is not None:
        inv = inv / c.rope_linear_factor
    if c.rope_scaling is not None:
        s = c.rope_scaling
        wavelen = 2.0 * jnp.pi / inv
        low_wl = s.original_max_position / s.low_freq_factor
        high_wl = s.original_max_position / s.high_freq_factor
        smooth = (s.original_max_position / wavelen - s.low_freq_factor) / (
            s.high_freq_factor - s.low_freq_factor
        )
        scaled = jnp.where(
            wavelen > low_wl,
            inv / s.factor,
            jnp.where(
                wavelen < high_wl,
                inv,
                (1 - smooth) * inv / s.factor + smooth * inv,
            ),
        )
        inv = scaled
    return inv


def rope_frequency_pair(config: LlamaConfig):
    """(global_inv_freq, local_inv_freq) — local is None unless the model
    uses per-layer-type RoPE bases (Gemma-3 `rope_local_theta`). Select
    per sub-layer with `pick_rope` using the static window the layer scan
    already passes."""
    glob = rope_frequencies(config)
    loc = (rope_frequencies(config, theta=config.rope_local_theta)
           if config.rope_local_theta is not None else None)
    return glob, loc


def pick_rope(freqs, window):
    """freqs = (global, local|None); sliding sub-layers (window not None)
    use the local base when the model defines one. Static selection — the
    scan body is unrolled per pattern period."""
    glob, loc = freqs
    return loc if (window is not None and loc is not None) else glob


def apply_rope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array) -> jax.Array:
    """Rotate-half RoPE, HF convention. x: [..., T, heads, D], positions [..., T]."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, D/2]
    cos = jnp.cos(angles)[..., None, :]  # [..., T, 1, D/2]
    sin = jnp.sin(angles)[..., None, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2].astype(jnp.float32), x[..., d2:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _act(config):
    if config.act_fn == "silu":
        return jax.nn.silu
    if config.act_fn == "gelu_tanh":
        return functools.partial(jax.nn.gelu, approximate=True)
    raise ValueError(f"unknown act_fn {config.act_fn!r}")


def _mlp(x, gate, up, down, act=jax.nn.silu):
    h = act(mm(x, gate)) * mm(x, up)
    return mm(h, down)


def _ffn(x, lp, config):
    """MLP block: dense gated MLP (SwiGLU / Gemma GeGLU), or the Mixtral
    sparse-MoE block when the layer params carry a router (static pytree
    check, resolved at trace time). x may be [B, H], [T, H], or [B, T, H]."""
    if "router" not in lp:
        return _mlp(x, lp["gate"], lp["up"], lp["down"], _act(config))
    from cxl_speckv_tpu.models.moe import moe_ffn

    flat = x.reshape(-1, x.shape[-1])
    out = moe_ffn(flat, lp, config)
    return out.reshape(x.shape)


def _qkv(h, lp, config: LlamaConfig = None):
    """QKV projections, with the Qwen2-family bias and the Qwen3-family
    per-head q/k RMSNorm when present (key existence checks are static —
    resolved at trace time from the pytree). The qk-norm runs BEFORE RoPE,
    matching HF Qwen3Attention."""
    q, k, v = mm(h, lp["q"]), mm(h, lp["k"]), mm(h, lp["v"])
    if "q_bias" in lp:
        q = q + lp["q_bias"]
        k = k + lp["k_bias"]
        v = v + lp["v_bias"]
    if "q_norm" in lp:
        # follow the family's norm convention: plain RMSNorm (Qwen3) or
        # the Gemma 1+w form (Gemma-3, norm_offset)
        eps = config.rms_eps if config is not None else 1e-6
        off = 1.0 if (config is not None and config.norm_offset) else 0.0

        def headwise(x, w):
            hd = w.shape[-1]
            xh = x.reshape(*x.shape[:-1], -1, hd)
            return rms_norm(xh, w, eps, off).reshape(x.shape)

        q = headwise(q, lp["q_norm"])
        k = headwise(k, lp["k_norm"])
    return q, k, v


def _block_residuals(x, o_flat, lp, config):
    """Shared residual structure after attention: o-projection (+ Gemma-2
    post-attention norm), then the MLP block (+ post-MLP norm)."""
    att = mm(o_flat.astype(x.dtype), lp["o"])
    if "o_bias" in lp:
        att = att + lp["o_bias"]
    if "post_attn_norm" in lp:
        att = _norm(att, lp["post_attn_norm"], config)
    x = x + att
    h2 = _norm(x, lp["mlp_norm"], config)
    mlp = _ffn(h2, lp, config)
    if "post_mlp_norm" in lp:
        mlp = _norm(mlp, lp["post_mlp_norm"], config)
    return x + mlp


# ---------------------------------------------------------------------------
# decode step (paged attention over the pools)
# ---------------------------------------------------------------------------

def _decode_core(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    token_ids: jax.Array,     # [B] int32
    positions: jax.Array,     # [B] int32 — position of this token (= seq_len-1)
    k_pools: jax.Array,       # [L, S, Hkv, bs, D/pack]
    v_pools: jax.Array,
    k_scales: jax.Array,      # [L, S, Hkv, bs]
    v_scales: jax.Array,
    block_table: jax.Array,   # [B, max_blocks] int32 (clamped)
    seq_lens: jax.Array,      # [B] int32 — length INCLUDING this token
    use_pallas: bool,
    mesh=None,
):
    """Single decode step, un-jitted (shared by decode_step/decode_multi)."""
    c = config
    B = token_ids.shape[0]
    bs = v_pools.shape[3]  # v pools [L, S, Hkv, bs, D/pack]
    rope_fs = rope_frequency_pair(c)
    x = _embed(params, c, token_ids)  # [B, H]

    # physical scatter coordinates of this token (clamped: overshoot steps of
    # a fused multi-decode past a finished lane stay inside the table)
    blk = jnp.clip(positions // bs, 0, block_table.shape[1] - 1)
    slots = jnp.take_along_axis(block_table, blk[:, None], axis=1)[:, 0]  # [B]
    offs = positions % bs

    attend, _ = _attend_fns(c, use_pallas, mesh)
    # per-layer mixed precision (CacheConfig.layer_kv_dtypes): kv_dtype is a
    # tuple of per-layer schemes; the scan sees one MIXED8 program with the
    # layer's scheme id as data
    sids = scheme_id_table(kv_dtype)
    eff_dtype = KVDtype.MIXED8 if sids is not None else kv_dtype

    def layer(carry, lp, li, window):
        x, k_pools, v_pools, k_scales, v_scales = carry
        sid = sids[li] if sids is not None else None
        h = _norm(x, lp["attn_norm"], c)
        q, k, v = _qkv(h, lp, config)
        q = q.reshape(B, c.num_q_heads, c.head_dim)
        k = k.reshape(B, c.num_kv_heads, c.head_dim)
        v = v.reshape(B, c.num_kv_heads, c.head_dim)
        # rope expects a T axis: treat B as T with per-token positions
        inv_freq = pick_rope(rope_fs, window)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        # quantize + scatter this token's KV into layer li of the pools
        if sids is None:
            kq, ks = quantize_kv(k, kv_dtype)   # [B, Hkv, D/pack], [B, Hkv, 1]
            vq, vs = quantize_kv(v, kv_dtype)
            kenc = encode_for_pool(kq, kv_dtype)
            venc = encode_for_pool(vq, kv_dtype)
        else:
            kenc, ks = quantize_kv_dual(k, sid)
            venc, vs = quantize_kv_dual(v, sid)
        kp = jax.lax.dynamic_index_in_dim(k_pools, li, 0, keepdims=False)
        vp = jax.lax.dynamic_index_in_dim(v_pools, li, 0, keepdims=False)
        ksc = jax.lax.dynamic_index_in_dim(k_scales, li, 0, keepdims=False)
        vsc = jax.lax.dynamic_index_in_dim(v_scales, li, 0, keepdims=False)
        kp = _kt_append(kp, kenc, slots, offs, bs)
        vp = vp.at[slots, :, offs].set(venc.astype(vp.dtype))
        ksc = _sc_append(ksc, ks[:, :, 0], slots, offs, bs)
        vsc = _sc_append(vsc, vs[:, :, 0], slots, offs, bs)

        o = attend(q, kp, vp, ksc, vsc, block_table, seq_lens, eff_dtype,
                   scheme_id=sid, window=window, sm_scale=c.sm_scale,
                   softcap=c.attn_softcap, sinks=lp.get("sinks"))
        x = _block_residuals(x, o.reshape(B, -1), lp, c)

        k_pools = jax.lax.dynamic_update_index_in_dim(k_pools, kp, li, 0)
        v_pools = jax.lax.dynamic_update_index_in_dim(v_pools, vp, li, 0)
        k_scales = jax.lax.dynamic_update_index_in_dim(k_scales, ksc, li, 0)
        v_scales = jax.lax.dynamic_update_index_in_dim(v_scales, vsc, li, 0)
        return (x, k_pools, v_pools, k_scales, v_scales)

    x, k_pools, v_pools, k_scales, v_scales = _scan_layers(
        layer, (x, k_pools, v_pools, k_scales, v_scales),
        params["layers"], c)

    x = _norm(x, params["final_norm"], c)
    logits = _final_logits(x, params, c)
    return logits, k_pools, v_pools, k_scales, v_scales


@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "use_pallas", "mesh"),
    donate_argnames=("k_pools", "v_pools", "k_scales", "v_scales"),
)
def decode_step(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    token_ids: jax.Array,
    positions: jax.Array,
    k_pools: jax.Array,
    v_pools: jax.Array,
    k_scales: jax.Array,
    v_scales: jax.Array,
    block_table: jax.Array,
    seq_lens: jax.Array,
    *,
    use_pallas: bool = False,
    mesh=None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One decode step for a batch of sequences.

    Appends this token's quantized KV into the pools (in-place under jit via
    donation), then attends over the pool including it. Returns
    (logits [B, V], k_pools, v_pools, k_scales, v_scales).
    """
    return _decode_core(params, config, kv_dtype, token_ids, positions,
                        k_pools, v_pools, k_scales, v_scales, block_table,
                        seq_lens, use_pallas, mesh)


@functools.partial(jax.jit, static_argnames=("k",))
def token_logprobs(logits: jax.Array, toks: jax.Array, *, k: int):
    """Standalone jitted `_token_logprobs` (single-token decode path)."""
    return _token_logprobs(logits, toks, k)


def _token_logprobs(logits: jax.Array, toks: jax.Array, k: int):
    """Raw-distribution logprobs (OpenAI semantics: log_softmax of the
    model logits BEFORE temperature/top-p transforms): the chosen token's
    logprob plus the top-k alternatives (ids + logprobs)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(
        lp, toks[..., None].astype(jnp.int32), axis=-1)[..., 0]
    tv, ti = jax.lax.top_k(lp, k)
    return chosen, ti.astype(jnp.int32), tv


@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "use_pallas", "horizon", "top_k",
                     "return_logits", "logprobs_k", "lstm_eos", "mesh"),
    donate_argnames=("k_pools", "v_pools", "k_scales", "v_scales"),
)
def decode_multi(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    first_tokens: jax.Array,   # [B] int32 — last sampled token per lane
    start_positions: jax.Array,  # [B] int32 — its position (= current len - 1)
    k_pools: jax.Array,
    v_pools: jax.Array,
    k_scales: jax.Array,
    v_scales: jax.Array,
    block_table: jax.Array,    # [B, max_blocks], must cover horizon new tokens
    key: jax.Array,            # PRNG key for in-graph sampling
    temperatures: jax.Array,   # [B] f32; <= 0 means greedy
    top_ps: jax.Array | None = None,  # [B] f32 nucleus p; 0 / >= 1 = off
    pen_info: jax.Array | None = None,    # [B, 5] int32 penalty metadata
    pen_counts: jax.Array | None = None,  # [rows + 1, V] int32 token stats
    lstm_params=None,          # prefetcher LSTM param tree (in-graph pcont)
    lstm_hist: jax.Array | None = None,  # [B, H16] int32 bucketed histories
    *,
    horizon: int = 8,
    use_pallas: bool = False,
    top_k: int = 0,
    return_logits: bool = False,
    logprobs_k: int = 0,
    lstm_eos: int = -1,        # static bucketed EOS class for pcont
    mesh=None,
) -> tuple:
    """`horizon` decode steps fused into one device program — sampling
    happens in-graph, so one dispatch emits `horizon` tokens per lane.

    On remote-dispatch TPU runtimes every host->device round trip costs
    milliseconds; a fused multi-step loop amortizes the per-step engine
    overhead by `horizon`x. Callers must pre-extend sequences so the block
    table covers positions start .. start+horizon-1 (tokens generated past a
    stop condition are simply discarded host-side — lanes are independent,
    so overshoot wastes only compute).

    Returns (tokens [B, horizon], k_pools, v_pools, k_scales, v_scales)
    where tokens[:, j] was sampled after feeding the j-th token. With
    return_logits, the per-step logits [B, horizon, V] are appended — the
    draft-proposal distributions that speculative sampling's acceptance
    rule needs (`engine/spec.py`). With logprobs_k > 0, three arrays are
    appended instead: chosen-token logprobs [B, horizon] and the top-k
    alternative ids/logprobs [B, horizon, k] (raw-distribution, see
    `_token_logprobs`).

    With pen_info/pen_counts, sampling penalties apply in-graph each step
    (frequency/presence/repetition — `engine/sampling.py` module comment)
    and each sampled token scatter-counts into its lane's stats row; the
    updated pen_counts is appended LAST to the return tuple. Logprobs stay
    raw-distribution (pre-penalty), consistent with the temperature/top-p
    choice above.

    With lstm_params/lstm_hist, the in-graph prefetch-LSTM continue
    probability [B] rides home as ONE extra bitcast-f32 column of the
    tokens array (tokens becomes [B, horizon + 1]) — not a separate
    output, so the engine's per-round value fetch count stays at one.
    """
    from cxl_speckv_tpu.engine.sampling import penalize_and_count, sample_tokens

    def step(carry, j):
        toks, kp, vp, ks, vs, key, pc = carry
        positions = start_positions + j
        logits, kp, vp, ks, vs = _decode_core(
            params, config, kv_dtype, toks, positions, kp, vp, ks, vs,
            block_table, positions + 1, use_pallas, mesh)
        key, sub = jax.random.split(key)
        if pc is not None:
            nxt, pc = penalize_and_count(
                logits, pen_info, pc,
                lambda lg: sample_tokens(lg, temperatures, sub, top_k,
                                         top_ps=top_ps))
            nxt = nxt.astype(jnp.int32)
        else:
            nxt = sample_tokens(logits, temperatures, sub, top_k,
                                top_ps=top_ps).astype(jnp.int32)
        ys = [nxt]
        if logprobs_k:
            ys += list(_token_logprobs(logits, nxt, logprobs_k))
        if return_logits:
            ys.append(logits)
        return (nxt, kp, vp, ks, vs, key, pc), tuple(ys)

    (_, k_pools, v_pools, k_scales, v_scales, _, pen_counts), ys = jax.lax.scan(
        step, (first_tokens, k_pools, v_pools, k_scales, v_scales, key,
               pen_counts),
        jnp.arange(horizon))
    # scan stacks on axis 0 (the horizon); callers want batch-major
    out = [ys[0].T, k_pools, v_pools, k_scales, v_scales]
    out += [y.swapaxes(0, 1) for y in ys[1:]]
    if lstm_params is not None:
        # in-graph prefetch-LSTM inference (r5, VERDICT r4 weak #4): the
        # 2x128 predictor's continue-probability rides the decode round
        # instead of a host-thread CPU dispatch (measured ~9% serving tax
        # from that worker's existence, NOTES_ROUND4 thrash table). The
        # post-round 16-token window is the PRE-round history shifted by
        # this round's freshly sampled tokens — exactly what the host
        # predictor would see after observe_tokens, so the value stays
        # valid until this lane decodes again (precisely the span the
        # prefetch gate consults while the lane waits for rotation).
        # The probability rides HOME inside the tokens array as one
        # bitcast f32 column (r5 thrash re-measure: a separate output
        # means a separate value fetch, and on a remote-dispatch runtime
        # every fetch is a ~10 ms round trip on the decode hot path).
        from cxl_speckv_tpu.prefetcher.lstm import lstm_pcont
        pc = lstm_pcont(lstm_params, lstm_hist, ys[0].T, lstm_eos)
        out[0] = jnp.concatenate(
            [out[0], jax.lax.bitcast_convert_type(
                pc.astype(jnp.float32), jnp.int32)[:, None]], axis=1)
    if pen_counts is not None:
        out.append(pen_counts)
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "use_pallas", "horizon", "top_k",
                     "rng_seed", "return_logits", "logprobs_k", "lstm_eos",
                     "lstm_cols", "mesh"),
    donate_argnames=("k_pools", "v_pools", "k_scales", "v_scales",
                     "pen_counts"),
)
def decode_multi_packed(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    packed: jax.Array,  # [B, max_blocks + 4] int32:
                        # col 0 = first token, 1 = start position,
                        # 2 = sampling metadata (encode_sampling), 3 = rng counter,
                        # 4: = block-table row (guard-clamped)
    k_pools: jax.Array,
    v_pools: jax.Array,
    k_scales: jax.Array,
    v_scales: jax.Array,
    pen_info: jax.Array | None = None,    # [B, 5] int32 penalty metadata
    pen_counts: jax.Array | None = None,  # [rows + 1, V] int32 token stats
    lstm_params=None,
    *,
    horizon: int = 8,
    use_pallas: bool = False,
    top_k: int = 0,
    rng_seed: int = 0,
    return_logits: bool = False,
    logprobs_k: int = 0,
    lstm_eos: int = -1,
    lstm_cols: int = 0,   # trailing packed columns = bucketed histories
    mesh=None,
) -> tuple:
    """`decode_multi` with all per-round host inputs packed into ONE array —
    a single host->device transfer per engine round. On remote-dispatch
    runtimes each argument transfer costs a round trip; this is the decode
    hot path, so everything rides one int32 matrix — including (r5) the
    in-graph pcont leg's bucketed 16-token histories as the LAST lstm_cols
    columns (a separate [B, 16] operand was one more ~10 ms upload per
    round). With pen_info/pen_counts the updated pen_counts is appended
    LAST; with lstm_params the continue probability rides inside the
    tokens array (see `decode_multi`)."""
    from cxl_speckv_tpu.engine.sampling import decode_sampling

    first_tokens = packed[:, 0]
    start_positions = packed[:, 1]
    temperatures, top_ps = decode_sampling(packed[:, 2])
    key = jnp.array([rng_seed, 0], jnp.uint32) + jnp.array(
        [0, 1], jnp.uint32) * packed[0, 3].astype(jnp.uint32)
    if lstm_cols:
        block_table = packed[:, 4:-lstm_cols]
        lstm_hist = packed[:, -lstm_cols:]
    else:
        block_table = packed[:, 4:]
        lstm_hist = None
    return decode_multi(
        params, config, kv_dtype, first_tokens, start_positions,
        k_pools, v_pools, k_scales, v_scales, block_table, key, temperatures,
        top_ps, pen_info, pen_counts, lstm_params, lstm_hist,
        horizon=horizon, use_pallas=use_pallas, top_k=top_k,
        return_logits=return_logits, logprobs_k=logprobs_k,
        lstm_eos=lstm_eos, mesh=mesh)


@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "max_blocks", "rng_seed",
                     "use_pallas", "logprobs_k", "prompt_scores", "mesh"),
    donate_argnames=("k_pools", "v_pools", "k_scales", "v_scales",
                     "pen_counts"),
)
def prefill_batch_packed(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    packed: jax.Array,  # [B, 4 + max_blocks + T] int32 per lane:
                        # 0 = start_pos, 1 = valid_len (0 = inactive lane),
                        # 2 = sampling metadata word, 3 = rng counter,
                        # 4:4+mb = table row (guard-clamped), rest = tokens
    k_pools: jax.Array,
    v_pools: jax.Array,
    k_scales: jax.Array,
    v_scales: jax.Array,
    pen_info: jax.Array | None = None,    # [B, 5] int32 penalty metadata
    pen_counts: jax.Array | None = None,  # [rows + 1, V] int32 token stats
    *,
    max_blocks: int,
    rng_seed: int = 0,
    use_pallas: bool = False,
    logprobs_k: int = 0,
    prompt_scores: bool = False,
    mesh=None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched chunked prefill: every prefilling lane's chunk runs in ONE
    device program (causal within the chunk + streamed quantized pool
    context), with each lane's next token sampled in-graph.

    Returns (tokens [B], pools). Inactive lanes (valid_len 0) scatter to the
    guard slot and their token is meaningless. With logprobs_k > 0,
    appends chosen-token logprobs [B] and top-k ids/logprobs [B, k]
    (raw-distribution — `_token_logprobs`) for the sampled first token.
    With prompt_scores, appends [B, T] per-position scores: scores[t] =
    log p(token[t+1] | prefix..t) for t < valid-1 (0 elsewhere) — the
    echo/perplexity surface; the cross-chunk boundary is covered by the
    engine re-feeding one token per chunk.

    With pen_info/pen_counts, the penalty hooks run in-graph: rows flagged
    for reset (first chunk of a request) zero first, this chunk's prompt
    tokens set their repetition-presence bit, and the sampled token is
    penalized and (on the prompt-completing chunk only, flag bit 1)
    counted. The updated pen_counts is appended LAST to the return tuple.
    """
    from cxl_speckv_tpu.engine.sampling import (
        pen_mark_prompt,
        pen_reset_rows,
        penalize_and_count,
        sample_tokens,
    )
    from cxl_speckv_tpu.ops.quant import dequantize_kv

    _, attend_chunk = _attend_fns(config, use_pallas, mesh)

    c = config
    B = packed.shape[0]
    T = packed.shape[1] - 4 - max_blocks
    bs = v_pools.shape[3]
    guard_slot = k_pools.shape[1] - 1
    rope_fs = rope_frequency_pair(c)

    from cxl_speckv_tpu.engine.sampling import decode_sampling

    start = packed[:, 0]                                  # [B]
    valid = packed[:, 1]
    temps, top_ps = decode_sampling(packed[:, 2])
    key = jnp.array([rng_seed, 0], jnp.uint32) + jnp.array(
        [0, 1], jnp.uint32) * packed[0, 3].astype(jnp.uint32)
    tables = packed[:, 4:4 + max_blocks]
    token_ids = packed[:, 4 + max_blocks:]

    positions = start[:, None] + jnp.arange(T)[None, :]   # [B, T]
    t_idx = jnp.arange(T)[None, :]
    blk = jnp.clip(positions // bs, 0, max_blocks - 1)
    slots = jnp.take_along_axis(tables, blk, axis=1)
    slots = jnp.where(t_idx < valid[:, None], slots, guard_slot)
    offs = positions % bs
    x = _embed(params, c, token_ids)                      # [B, T, H]
    sids = scheme_id_table(kv_dtype)
    eff_dtype = KVDtype.MIXED8 if sids is not None else kv_dtype

    def layer(carry, lp, li, window):
        x, k_pools, v_pools, k_scales, v_scales = carry
        sid = sids[li] if sids is not None else None
        h = _norm(x, lp["attn_norm"], c)
        q, k, v = _qkv(h, lp, config)
        q = q.reshape(B, T, c.num_q_heads, c.head_dim)
        k = k.reshape(B, T, c.num_kv_heads, c.head_dim)
        v = v.reshape(B, T, c.num_kv_heads, c.head_dim)
        inv_freq = pick_rope(rope_fs, window)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        kp = jax.lax.dynamic_index_in_dim(k_pools, li, 0, keepdims=False)
        vp = jax.lax.dynamic_index_in_dim(v_pools, li, 0, keepdims=False)
        ksc = jax.lax.dynamic_index_in_dim(k_scales, li, 0, keepdims=False)
        vsc = jax.lax.dynamic_index_in_dim(v_scales, li, 0, keepdims=False)

        if sids is None:
            kq, ks = quantize_kv(k, kv_dtype)
            vq, vs = quantize_kv(v, kv_dtype)
            kenc = encode_for_pool(kq, kv_dtype)
            venc = encode_for_pool(vq, kv_dtype)
            k_use = dequantize_kv(kq, ks, kv_dtype)
            v_use = dequantize_kv(vq, vs, kv_dtype)
        else:
            kenc, ks = quantize_kv_dual(k, sid)
            venc, vs = quantize_kv_dual(v, sid)
            k_use = dequantize_dual(kenc, ks, sid)
            v_use = dequantize_dual(venc, vs, sid)

        o = attend_chunk(q, k_use, v_use, kp, vp, ksc, vsc,
                         tables, start, eff_dtype, scheme_id=sid,
                         window=window, sm_scale=c.sm_scale,
                         softcap=c.attn_softcap, sinks=lp.get("sinks"))
        x = _block_residuals(x, o.reshape(B, T, -1), lp, c)

        kp = _kt_append(kp, kenc, slots, offs, bs)
        vp = vp.at[slots, :, offs].set(venc.astype(vp.dtype))
        ksc = _sc_append(ksc, ks[..., 0], slots, offs, bs)
        vsc = _sc_append(vsc, vs[..., 0], slots, offs, bs)
        k_pools = jax.lax.dynamic_update_index_in_dim(k_pools, kp, li, 0)
        v_pools = jax.lax.dynamic_update_index_in_dim(v_pools, vp, li, 0)
        k_scales = jax.lax.dynamic_update_index_in_dim(k_scales, ksc, li, 0)
        v_scales = jax.lax.dynamic_update_index_in_dim(v_scales, vsc, li, 0)
        return (x, k_pools, v_pools, k_scales, v_scales)

    x, k_pools, v_pools, k_scales, v_scales = _scan_layers(
        layer, (x, k_pools, v_pools, k_scales, v_scales),
        params["layers"], c)
    # last-valid hidden state per lane -> logits -> sampled token
    last = jnp.clip(valid - 1, 0, T - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None].astype(jnp.int32)
                                 .repeat(x.shape[-1], axis=2), axis=1)[:, 0]
    x_last = _norm(x_last, params["final_norm"], c)
    logits = _final_logits(x_last, params, c)             # [B, V]
    if pen_counts is not None:
        # reset flagged rows, mark this chunk's prompt tokens (repetition
        # penalty spans the prompt), then sample penalized
        pen_counts = pen_reset_rows(pen_info, pen_counts)
        pen_counts = pen_mark_prompt(pen_info, pen_counts, token_ids, valid)
        toks, pen_counts = penalize_and_count(
            logits, pen_info, pen_counts,
            lambda lg: sample_tokens(lg, temps, key, top_ps=top_ps))
        toks = toks.astype(jnp.int32)
    else:
        toks = sample_tokens(logits, temps, key,
                             top_ps=top_ps).astype(jnp.int32)
    out = [toks, k_pools, v_pools, k_scales, v_scales]
    if logprobs_k:
        out += list(_token_logprobs(logits, toks, logprobs_k))
    if prompt_scores:
        xs = _norm(x, params["final_norm"], c)            # [B, T, H]
        lp = jax.nn.log_softmax(
            _final_logits(xs, params, c).astype(jnp.float32), axis=-1)
        targets = jnp.roll(token_ids, -1, axis=1)         # target[t] = tok[t+1]
        sc = jnp.take_along_axis(
            lp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
        # positions >= valid-1 have no in-chunk target
        out.append(jnp.where(t_idx < (valid - 1)[:, None], sc, 0.0))
    if pen_counts is not None:
        out.append(pen_counts)
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "max_blocks", "rng_seed",
                     "use_pallas", "mesh"),
    donate_argnames=("k_pools", "v_pools", "k_scales", "v_scales"),
)
def prefill_chunk_packed(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    packed: jax.Array,  # [4 + max_blocks + T] int32:
                        # 0 = start_pos, 1 = valid_len, 2 = temp*1000,
                        # 3 = rng counter, 4:4+mb = table row, rest = tokens
    k_pools: jax.Array,
    v_pools: jax.Array,
    k_scales: jax.Array,
    v_scales: jax.Array,
    *,
    max_blocks: int,
    rng_seed: int = 0,
    use_pallas: bool = False,
    mesh=None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Prefill one chunk AND sample the next token in one dispatch (single
    packed H2D in, single scalar token out — the per-request prefill path
    otherwise costs ~5 host->device round trips)."""
    from cxl_speckv_tpu.engine.sampling import sample_tokens

    from cxl_speckv_tpu.engine.sampling import decode_sampling

    start, valid_len = packed[0], packed[1]
    temps, top_ps = decode_sampling(packed[2][None])
    key = jnp.array([rng_seed, 0], jnp.uint32) + jnp.array(
        [0, 1], jnp.uint32) * packed[3].astype(jnp.uint32)
    table_row = packed[4:4 + max_blocks]
    token_ids = packed[4 + max_blocks:]
    logits, k_pools, v_pools, k_scales, v_scales = prefill_chunk(
        params, config, kv_dtype, token_ids, start,
        k_pools, v_pools, k_scales, v_scales, table_row, valid_len,
        use_pallas=use_pallas, mesh=mesh)
    tok = sample_tokens(logits[None], temps, key,
                        top_ps=top_ps)[0].astype(jnp.int32)
    return tok, k_pools, v_pools, k_scales, v_scales


# ---------------------------------------------------------------------------
# fused engine rounds: migration batch + model step in ONE device program
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "use_pallas", "horizon", "top_k",
                     "rng_seed", "store_ops", "mesh", "logprobs_k"),
    donate_argnames=("k_pools", "v_pools", "k_scales", "v_scales",
                     "k_store", "v_store", "ks_store", "vs_store",
                     "pen_counts"),
)
def decode_round_fused(
    params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    packed: jax.Array,   # [B, max_blocks + 4] int32 (see decode_multi_packed)
    mig: jax.Array,      # [4, M] int32 migration batch (see hoststore)
    k_pools: jax.Array,
    v_pools: jax.Array,
    k_scales: jax.Array,
    v_scales: jax.Array,
    k_store: jax.Array,
    v_store: jax.Array,
    ks_store: jax.Array,
    vs_store: jax.Array,
    pen_info: jax.Array | None = None,
    pen_counts: jax.Array | None = None,
    *,
    horizon: int = 8,
    use_pallas: bool = False,
    top_k: int = 0,
    rng_seed: int = 0,
    store_ops=None,
    mesh=None,
    logprobs_k: int = 0,
):
    """One complete engine decode round as a single dispatch: apply the
    queued block migrations (host-tier DMA in/out — the descriptor-ring
    batch), then run the fused multi-token decode over the updated pools.

    The TPU-native collapse of the reference's ioctl-per-operation hot path
    (`vllm_speckv_backend.py:117-126` issues one ioctl per layer per token;
    here one program per `horizon` tokens x batch, migrations included).
    Returns (tokens [B, horizon], pools..., stores...).
    """
    from cxl_speckv_tpu.runtime.hoststore import migrate_in_graph

    pools, stores = migrate_in_graph(
        (k_pools, v_pools, k_scales, v_scales),
        (k_store, v_store, ks_store, vs_store), mig, store_ops)
    toks, *rest = decode_multi_packed(
        params, config, kv_dtype, packed, *pools, pen_info, pen_counts,
        horizon=horizon, use_pallas=use_pallas, top_k=top_k,
        rng_seed=rng_seed, mesh=mesh, logprobs_k=logprobs_k)
    # keep stores at fixed positions:
    # (toks, pools x4, stores x4[, lp x3][, pen_counts])
    return (toks, *rest[:4], *stores, *rest[4:])


@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "max_blocks", "rng_seed",
                     "use_pallas", "store_ops", "mesh", "logprobs_k",
                     "prompt_scores"),
    donate_argnames=("k_pools", "v_pools", "k_scales", "v_scales",
                     "k_store", "v_store", "ks_store", "vs_store",
                     "pen_counts"),
)
def prefill_round_fused(
    params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    packed: jax.Array,   # [B, 4 + max_blocks + T] int32 (see prefill_batch_packed)
    mig: jax.Array,      # [4, M] int32
    k_pools: jax.Array,
    v_pools: jax.Array,
    k_scales: jax.Array,
    v_scales: jax.Array,
    k_store: jax.Array,
    v_store: jax.Array,
    ks_store: jax.Array,
    vs_store: jax.Array,
    pen_info: jax.Array | None = None,
    pen_counts: jax.Array | None = None,
    *,
    max_blocks: int,
    rng_seed: int = 0,
    use_pallas: bool = False,
    store_ops=None,
    mesh=None,
    logprobs_k: int = 0,
    prompt_scores: bool = False,
):
    """Batched chunked prefill with the round's migration batch fused in
    (session restores / evictions ride the same dispatch)."""
    from cxl_speckv_tpu.runtime.hoststore import migrate_in_graph

    pools, stores = migrate_in_graph(
        (k_pools, v_pools, k_scales, v_scales),
        (k_store, v_store, ks_store, vs_store), mig, store_ops)
    toks, *rest = prefill_batch_packed(
        params, config, kv_dtype, packed, *pools, pen_info, pen_counts,
        max_blocks=max_blocks, rng_seed=rng_seed, use_pallas=use_pallas,
        mesh=mesh, logprobs_k=logprobs_k, prompt_scores=prompt_scores)
    # (toks, pools x4, stores x4[, lp x3][, prompt scores][, pen_counts])
    return (toks, *rest[:4], *stores, *rest[4:])


# ---------------------------------------------------------------------------
# streamed step: serve a sequence whose KV exceeds HBM from the host tier
# ---------------------------------------------------------------------------

def _stream_append_rmw(fetched, chunks, offs_in, valid, *, kv_dtype,
                       nblk: int, bs: int, T: int):
    """Insert a lane's fresh chunk KV into its fetched touched-block slabs
    (the read-modify-write half of the streamed append). `fetched` is
    (fk, fv, fks, fvs) [nblk, L, Hkv, bs, *]; `chunks` is the per-layer
    quantized chunk KV (kq, vq, ks, vs) [L, T, Hkv, *] aligned to the
    fetched order. Returns the RMW'd slabs for `stash_blocks`. vmap-safe
    over a leading lane axis (the batched wrapper consolidates all lanes
    into one fetch + one scatter)."""
    L = fetched[0].shape[1]
    # [nblk, L, Hkv, bs, *] -> token-major [nblk*bs, L, Hkv, *]
    tok_major = lambda a: a.transpose(0, 3, 1, 2, *range(4, a.ndim)).reshape(
        nblk * bs, L, *a.shape[2:3], *a.shape[4:])

    def insert(flat, chunk):
        # flat [nblk*bs, L, Hkv, *]; chunk [L, T, Hkv, *] -> [T, L, Hkv, *]
        t_idx = offs_in + jnp.arange(T)
        idx = jnp.where(jnp.arange(T) < valid, t_idx, nblk * bs)
        chunk = chunk.swapaxes(0, 1)
        if chunk.dtype != jnp.float32:  # kv values (not the f32 scales)
            chunk = encode_for_pool(chunk, kv_dtype)
        return flat.at[idx].set(chunk.astype(flat.dtype), mode="drop")

    def back(flat, ref):
        # [nblk*bs, L, Hkv, *] -> [nblk, L, Hkv, bs, *]
        a = flat.reshape(nblk, bs, *flat.shape[1:])
        perm = (0, 2, 3, 1) + tuple(range(4, a.ndim))
        return a.transpose(perm).astype(ref.dtype)

    return tuple(back(insert(tok_major(f), ch), f)
                 for f, ch in zip(fetched, chunks))


def _stream_lane(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    packed: jax.Array,   # int32 [4 + table_width + T] (one lane)
    stores_in,           # (k, v, ks, vs) flat-row host store arrays
    *,
    max_blocks: int,     # context blocks the table row covers
    wave: int,           # blocks streamed per attention wave
    rng_seed: int,
    store_ops,
    logprobs_k: int = 0,
    prompt_scores: bool = False,
    stores_read=None,    # read-only store view for context gathers; the
                         # batched path passes the PRE-dispatch stores so
                         # lanes' gathers don't serialize behind earlier
                         # lanes' appends (lanes own disjoint slots)
    stage_mb: int = 0,   # staged-gather budget (MB); 0 = per-wave fetches
    ctx_waves: int | None = None,  # static bound on context waves actually
                         # gathered by the staged path (engine-computed,
                         # pow2-bucketed); None = full table width
    defer_append: bool = False,  # return the append payload instead of
                         # stashing (the batched wrapper consolidates all
                         # lanes' RMW into ONE fetch + ONE scatter)
    pen_info=None,       # [5] int32 — this lane's penalty metadata row
                         # (engine/sampling.py layout); None = no penalties
    pen_counts=None,     # [rows + 1, V] int32 token-count plane (threaded
                         # through lanes by the batched wrapper)
    mark_prompt: bool = False,  # static: prefill chunks set the prompt-
                         # presence bit for their fed tokens (decode steps
                         # feed an already-counted output token)
):
    """One host-streamed lane: a prefill chunk (T = chunk) or one decode
    token (T = 1). Shared body of `stream_step` (single dispatch per lane)
    and `stream_step_batched` (lanes scanned inside ONE dispatch).

    Staged-gather mode (r4, VERDICT r3 next-step #4): with stage_mb > 0 and
    uniform attention windows, context KV is gathered from the host store in
    ONE host op per LAYER GROUP (G layers sized to the staging budget) into
    device slabs, and attention consumes cheap device slices
    (`stream_context_attention_slab`). Measured on v5e (hostop_probe): host
    op cost is ~5 ms per `compute_on` block + ~1 ms per array, nearly
    independent of bytes — so op count, not byte volume, is the streamed
    path's wall clock. Group gathers are issued OUTSIDE loop carries, so
    they are dataflow-independent and the runtime overlaps them (probe D).

    Returns (next_token, stores, logprob arrays or None, prompt scores
    [T] or None). With prompt_scores, scores[t] = log p(token[t+1] |
    prefix..t) for t < valid-1 (0 elsewhere) — the same echo surface as
    `prefill_batch_packed`; the engine covers chunk boundaries by
    re-feeding one token per chunk (the streamed append's read-modify-write
    re-stores byte-identical quantized KV for the re-fed position)."""
    from cxl_speckv_tpu.engine.sampling import sample_tokens
    from cxl_speckv_tpu.ops.quant import dequantize_kv
    from cxl_speckv_tpu.ops.stream_attention import (
        merge_chunk_causal,
        stream_context_attention,
    )

    c = config
    stores = stores_in
    stores_read = stores_read if stores_read is not None else stores_in
    bs = stores[0].shape[2]
    L = c.num_layers
    ops = store_ops

    n_waves = -(-max_blocks // wave)
    table_width_ctx = n_waves * wave

    from cxl_speckv_tpu.engine.sampling import decode_sampling

    start = packed[0]
    valid = packed[1]
    temps, top_ps = decode_sampling(packed[2][None])
    key = jnp.array([rng_seed, 0], jnp.uint32) + jnp.array(
        [0, 1], jnp.uint32) * packed[3].astype(jnp.uint32)
    # caller packs [4 + tw + T] with tw = table_width_ctx + nblk and
    # nblk = T//bs + 1 (append pad); recover the static T from the length
    rest = packed.shape[0] - 4 - table_width_ctx
    T = _solve_chunk_len(rest, bs)
    nblk = T // bs + 1
    table_width = table_width_ctx + nblk
    host_row = packed[4:4 + table_width]
    token_ids = packed[4 + table_width:]

    positions = start + jnp.arange(T)
    rope_fs = rope_frequency_pair(c)
    x = _embed(params, c, token_ids)  # [T, H]

    import os
    wins = c.layer_windows()
    uniform_windows = len(set(wins)) <= 1
    staged = (stage_mb > 0 and uniform_windows and ctx_waves is not None
              and os.environ.get("SPECKV_STREAM_STAGE", "1") != "0")
    # prefetch pipelining (window-free models only — see
    # stream_context_attention): the layer scan carries the NEXT layer's
    # wave-0 slab, fetched while the current layer's matmuls run.
    # SPECKV_STREAM_PIPELINE=0 is the A/B escape hatch (process-static).
    # Superseded by staged gathers; kept as the fallback path's variant.
    pipelined = (not staged
                 and not any(w is not None for w in wins)
                 and os.environ.get("SPECKV_STREAM_PIPELINE", "1") != "0")
    pre0 = (ops.fetch_layer(stores_read, host_row[:wave], jnp.int32(0), L)
            if pipelined else None)

    def layer_core(x, lp, window, *, slab=None, pre=None, li=None):
        """Shared per-layer math; context attention reads either a staged
        device slab or the host store (wave-by-wave, optionally pipelined).
        Returns (x, next_pre, per-layer quantized chunk KV)."""
        from cxl_speckv_tpu.ops.stream_attention import (
            stream_context_attention_slab)
        h = _norm(x, lp["attn_norm"], c)
        q, k, v = _qkv(h, lp, config)
        q = q.reshape(T, c.num_q_heads, c.head_dim)
        k = k.reshape(T, c.num_kv_heads, c.head_dim)
        v = v.reshape(T, c.num_kv_heads, c.head_dim)
        inv_freq = pick_rope(rope_fs, window)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        # store-consistent views of the fresh chunk KV
        kq, ksc = quantize_kv(k, kv_dtype)
        vq, vsc = quantize_kv(v, kv_dtype)
        k_use = dequantize_kv(kq, ksc, kv_dtype)
        v_use = dequantize_kv(vq, vsc, kv_dtype)

        npre = None
        if slab is not None:
            carry_sc = stream_context_attention_slab(
                q, slab, start, kv_dtype, block_size=bs, wave=wave,
                window=window, sm_scale=c.sm_scale, softcap=c.attn_softcap)
        elif pre is not None:
            carry_sc, npre = stream_context_attention(
                q, stores_read, host_row, start, li, kv_dtype, ops,
                num_layers=L, block_size=bs, max_blocks=table_width_ctx,
                wave=wave, window=window, sm_scale=c.sm_scale,
                softcap=c.attn_softcap, pre=pre,
                next_layer=jnp.minimum(li + 1, L - 1))
        else:
            carry_sc = stream_context_attention(
                q, stores_read, host_row, start, li, kv_dtype, ops,
                num_layers=L, block_size=bs, max_blocks=table_width_ctx,
                wave=wave, window=window, sm_scale=c.sm_scale,
                softcap=c.attn_softcap)
        o = merge_chunk_causal(q, k_use, v_use, carry_sc,
                               window=window, sm_scale=c.sm_scale,
                               softcap=c.attn_softcap,
                               sinks=lp.get("sinks"))
        x = _block_residuals(x, o.reshape(T, -1), lp, c)
        return x, npre, (kq, ksc[..., 0], vq, vsc[..., 0])

    if staged:
        import numpy as _np
        window = wins[0] if wins else None
        Wb = min(ctx_waves, n_waves) * wave       # staged block rows / layer
        row_bytes = sum(int(_np.prod(a.shape[1:])) * a.dtype.itemsize
                        for a in stores_read)
        G = max(1, min(L, int(stage_mb * (1 << 20)) // max(Wb * row_bytes, 1)))
        slots_ctx = host_row[:Wb]
        ys = []
        for l0 in range(0, L, G):
            g = min(G, L - l0)
            # ONE host op stages g layers x Wb context blocks; successive
            # group gathers carry no dataflow between them, so the runtime
            # overlaps them (hostop_probe case D)
            rows = (slots_ctx[None, :] * L
                    + (l0 + jnp.arange(g, dtype=slots_ctx.dtype))[:, None])
            slabs = ops.gather_rows(stores_read, rows.reshape(-1))
            slabs = tuple(a.reshape(g, Wb, *a.shape[1:]) for a in slabs)
            lps = jax.tree.map(lambda a: a[l0:l0 + g], params["layers"])

            def body(x, xs):
                lp, sk, sv, sks, svs = xs
                x, _, ykv = layer_core(x, lp, window,
                                       slab=(sk, sv, sks, svs))
                return x, ykv

            x, y = jax.lax.scan(body, x, (lps, *slabs))
            ys.append(y)
        kq_l, ks_l, vq_l, vs_l = (
            jnp.concatenate([y[i] for y in ys]) if len(ys) > 1 else ys[0][i]
            for i in range(4))
    else:
        def layer(carry, lp, li, window):
            x, pre = carry if pipelined else (carry, None)
            x, npre, ykv = layer_core(x, lp, window, pre=pre, li=li)
            out = (x, npre) if pipelined else x
            return out, ykv

        carry0 = (x, pre0) if pipelined else x
        carry_out, (kq_l, ks_l, vq_l, vs_l) = _scan_layers(
            layer, carry0, params["layers"], c, with_output=True)
        x = carry_out[0] if pipelined else carry_out
    # kq_l [L, T, Hkv, Dp] -> token-major [T, L, Hkv, Dp]

    # -- append: read-modify-write of the touched blocks (reads the
    # pre-dispatch view — this lane owns its slots, so no other lane's
    # append can have touched them) ------------------------------------------
    b0 = start // bs
    offs_in = start % bs
    touched = jax.lax.dynamic_slice(host_row, (b0,), (nblk,))
    chunks = (kq_l, vq_l, ks_l, vs_l)
    if defer_append:
        # batched wrapper consolidates every lane's RMW into one
        # fetch + one scatter (2 host ops total instead of 2 per lane)
        append_payload = (touched, chunks, offs_in, valid)
    else:
        fetched = ops.fetch_blocks(stores_read, touched, L)
        rmw = _stream_append_rmw(fetched, chunks, offs_in, valid,
                                 kv_dtype=kv_dtype, nblk=nblk, bs=bs, T=T)
        stores = ops.stash_blocks(stores, rmw, touched, L)
        append_payload = None

    last = jnp.clip(valid - 1, 0, T - 1)
    x_last = jax.lax.dynamic_slice_in_dim(x, last, 1, axis=0)
    x_last = _norm(x_last, params["final_norm"], c)
    logits = _final_logits(x_last, params, c)
    if pen_counts is not None:
        # streamed penalties (r5): the same in-graph count plane as the
        # pooled programs — reset on the request's first chunk, prompt
        # marking at prefill, penalize + count at sampling. Lanes own
        # disjoint rows, so threading the plane through unrolled lanes
        # commutes.
        from cxl_speckv_tpu.engine.sampling import (
            pen_mark_prompt, pen_reset_rows, penalize_and_count)

        pi = pen_info[None]                                   # [1, 5]
        pen_counts = pen_reset_rows(pi, pen_counts)
        if mark_prompt:
            pen_counts = pen_mark_prompt(pi, pen_counts, token_ids[None],
                                         valid[None])
        tok, pen_counts = penalize_and_count(
            logits, pi, pen_counts,
            lambda lg: sample_tokens(lg, temps, key, top_ps=top_ps))
        tok = tok[0].astype(jnp.int32)
    else:
        tok = sample_tokens(logits, temps, key,
                            top_ps=top_ps)[0].astype(jnp.int32)
    lp = (_token_logprobs(logits[0], tok, logprobs_k)
          if logprobs_k else None)
    ps = None
    if prompt_scores:
        xs = _norm(x, params["final_norm"], c)               # [T, H]
        lpf = jax.nn.log_softmax(
            _final_logits(xs, params, c).astype(jnp.float32), axis=-1)
        targets = jnp.roll(token_ids, -1)                    # target[t] = tok[t+1]
        sc = jnp.take_along_axis(
            lpf, targets[:, None].astype(jnp.int32), axis=-1)[:, 0]
        ps = jnp.where(jnp.arange(T) < valid - 1, sc, 0.0)
    return tok, stores, lp, ps, append_payload, pen_counts


@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "max_blocks", "wave", "rng_seed",
                     "store_ops", "logprobs_k", "prompt_scores"),
    donate_argnames=("k_store", "v_store", "ks_store", "vs_store"),
)
def stream_step(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    packed: jax.Array,   # int32 [4 + table_width + T]:
                         # 0 = start_pos, 1 = valid_len, 2 = temp*1000,
                         # 3 = rng counter, 4:4+tw = host-slot row
                         # (guard-padded), rest = T token ids
    k_store: jax.Array,  # flat-row host store (runtime/hoststore.py)
    v_store: jax.Array,
    ks_store: jax.Array,
    vs_store: jax.Array,
    *,
    max_blocks: int,     # context blocks the table row covers
    wave: int = 4,       # blocks streamed per attention wave
    rng_seed: int = 0,
    store_ops=None,
    logprobs_k: int = 0,
    prompt_scores: bool = False,
):
    """Process T tokens of a HOST-RESIDENT sequence in one dispatch: a
    prefill chunk (T = chunk) or one decode token (T = 1).

    The sequence's entire KV lives in the host tier; context attention
    streams it wave-by-wave (`ops/stream_attention.py`) and the chunk's own
    quantized KV is appended back to the store with a read-modify-write of
    the touched blocks. HBM holds only the current wave + activations, so
    sequence length is bounded by the HOST pool — the capacity-expansion
    limit case (reference `README.md:16-19`, `docs/ARCHITECTURE.md:271`
    32K-128K adaptation; BASELINE config 3).

    Returns (next_token, stores...[, chosen_lp, top_ids, top_lps]
    [, prompt scores]). The next token is sampled in-graph from the last
    valid position.
    """
    tok, stores, lp, ps, _, _ = _stream_lane(
        params, config, kv_dtype, packed,
        (k_store, v_store, ks_store, vs_store),
        max_blocks=max_blocks, wave=wave, rng_seed=rng_seed,
        store_ops=store_ops, logprobs_k=logprobs_k,
        prompt_scores=prompt_scores)
    out = (tok, *stores)
    if logprobs_k:
        out += tuple(lp)
    if prompt_scores:
        out += (ps,)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "max_blocks", "wave", "rng_seed",
                     "store_ops", "logprobs_k", "prompt_scores", "stage_mb",
                     "ctx_waves", "mark_prompt"),
    donate_argnames=("k_store", "v_store", "ks_store", "vs_store",
                     "pen_counts"),
)
def stream_step_batched(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    packed: jax.Array,   # int32 [B, 4 + table_width + T] — B lanes, same
                         # phase (same static T); dead lanes valid_len=0
                         # with guard-slot rows
    k_store: jax.Array,
    v_store: jax.Array,
    ks_store: jax.Array,
    vs_store: jax.Array,
    pen_info: jax.Array | None = None,    # [B, 5] int32 penalty metadata
    pen_counts: jax.Array | None = None,  # [rows + 1, V] int32 token stats
    *,
    max_blocks: int,
    wave: int = 4,
    rng_seed: int = 0,
    store_ops=None,
    logprobs_k: int = 0,
    prompt_scores: bool = False,
    stage_mb: int = 0,   # staged-gather budget per lane (MB); 0 = legacy
    ctx_waves: int | None = None,  # static context-wave bound for staging
    mark_prompt: bool = False,     # prefill phase: set prompt-presence bits
):
    """B host-streamed lanes in ONE dispatch (VERDICT r2 next-step #4).

    Per-lane compute runs unrolled; the result is identical to B sequential
    `stream_step` dispatches (lanes own disjoint slots) — but per-dispatch
    overhead is paid ONCE per engine round, every lane's context gathers
    read the PRE-dispatch store view (dataflow-independent of other lanes'
    appends), and (r4) ALL lanes' append read-modify-writes consolidate
    into ONE fetch + ONE scatter — with staged context gathers
    (stage_mb > 0) the whole dispatch costs ~B*ceil(L/G) + 2 host ops
    instead of B*(L*waves + 2).

    Returns (tokens [B], stores...[, chosen_lp [B], ids [B,k], lps [B,k]]
    [, prompt scores [B, T]]).

    Lanes UNROLL (B is static, small) instead of `lax.scan`: XLA:TPU
    cannot carry pinned-host-memory-space arrays through a scan (layout
    mismatch "S(5)" at post-optimization, observed on v5e) — the unrolled
    chain is the same dataflow without the loop-carry constraint.
    """
    stores = stores_read = (k_store, v_store, ks_store, vs_store)
    L = config.num_layers
    outs, payloads = [], []
    for b in range(packed.shape[0]):
        tok, _, lp, ps, payload, pen_counts = _stream_lane(
            params, config, kv_dtype, packed[b], stores,
            max_blocks=max_blocks, wave=wave, rng_seed=rng_seed,
            store_ops=store_ops, logprobs_k=logprobs_k,
            prompt_scores=prompt_scores, stores_read=stores_read,
            stage_mb=stage_mb, ctx_waves=ctx_waves, defer_append=True,
            pen_info=(pen_info[b] if pen_counts is not None else None),
            pen_counts=pen_counts, mark_prompt=mark_prompt)
        payloads.append(payload)
        row = (tok,)
        if logprobs_k:
            row += tuple(lp)
        if prompt_scores:
            row += (ps,)
        outs.append(row)
    # consolidated append: one RMW fetch + one scatter for ALL lanes.
    # Lanes own disjoint slots; only dead/padded lanes share the guard
    # slot, whose contents are don't-care (their inserts drop).
    stores = _consolidated_append(payloads, stores, stores_read, store_ops,
                                  kv_dtype, L)
    stacked = tuple(jnp.stack([o[i] for o in outs])
                    for i in range(len(outs[0])))
    out = (stacked[0], *stores, *stacked[1:])
    if pen_counts is not None:
        out += (pen_counts,)
    return out


def _consolidated_append(payloads, stores, stores_read, store_ops, kv_dtype,
                         L: int):
    """One RMW fetch + one scatter inserting EVERY lane's fresh chunk KV
    (2 host ops total, not 2 per lane). payloads[b] = (touched [nblk],
    chunks (kq, ks, vq, vs) each [L, T, ...], offs_in, valid)."""
    B = len(payloads)
    nblk = payloads[0][0].shape[0]
    touched_all = jnp.concatenate([p[0] for p in payloads])      # [B*nblk]
    chunks = tuple(jnp.stack([p[1][i] for p in payloads])
                   for i in range(4))                            # [B, L, T, ...]
    offs = jnp.stack([p[2] for p in payloads])
    valids = jnp.stack([p[3] for p in payloads])
    fetched = store_ops.fetch_blocks(stores_read, touched_all, L)
    fetched = tuple(a.reshape(B, nblk, *a.shape[1:]) for a in fetched)
    T = chunks[0].shape[2]
    rmw = jax.vmap(functools.partial(_stream_append_rmw, kv_dtype=kv_dtype,
                                     nblk=nblk, bs=stores[0].shape[2], T=T))
    slabs = rmw(fetched, chunks, offs, valids)
    slabs = tuple(a.reshape(B * nblk, *a.shape[2:]) for a in slabs)
    return store_ops.stash_blocks(stores, slabs, touched_all, L)


def _solve_chunk_len(rest: int, bs: int) -> int:
    """Invert rest = T + T//bs + 1 for T (static ints)."""
    for t in range(rest - 1, 0, -1):
        if t + t // bs + 1 == rest:
            return t
    raise ValueError(f"no chunk length solves rest={rest} bs={bs}")


def stream_decode_nblk(horizon: int, bs: int) -> int:
    """Touched-block count for a fused streamed-decode span: `horizon`
    tokens starting at any in-block offset (worst case offset bs-1)."""
    return (horizon + bs - 2) // bs + 1


@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "max_blocks", "wave", "horizon",
                     "rng_seed", "store_ops", "logprobs_k", "ctx_waves"),
    donate_argnames=("k_store", "v_store", "ks_store", "vs_store",
                     "pen_counts"),
)
def stream_decode_multi_batched(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    packed: jax.Array,   # int32 [B, 4 + table_width + 1]: col 0 = start,
                         # 1 = valid steps (appends masked past it),
                         # 2 = sampling metadata, 3 = rng counter,
                         # 4:4+tw = host-slot row, last = seed token
    k_store: jax.Array,
    v_store: jax.Array,
    ks_store: jax.Array,
    vs_store: jax.Array,
    pen_info: jax.Array | None = None,    # [B, 5] int32 penalty metadata
    pen_counts: jax.Array | None = None,  # [rows + 1, V] int32 token stats
    *,
    max_blocks: int,
    wave: int,
    horizon: int,        # fused decode steps per dispatch
    rng_seed: int = 0,
    store_ops=None,
    logprobs_k: int = 0,
    ctx_waves: int | None = None,  # static context-wave bound; must cover
                                   # (start + horizon) tokens of table
):
    """`horizon` streamed-decode steps for B host-resident lanes in ONE
    dispatch — the streamed analog of `decode_multi` (r4).

    Why this exists: a streamed decode step's host gathers (the whole
    context, one fat op) and the dispatch constant (~25 ms measured,
    scripts/round_anatomy.py) are both PER-DISPATCH costs, while the
    context slab itself is LOOP-INVARIANT across consecutive decode steps.
    So: gather each lane's context into a device slab ONCE, scan `horizon`
    steps against it — each step writes its freshly quantized KV into the
    slab at its position, making step j+1's context attention read exactly
    the bytes a separate dispatch would have re-fetched (the math is
    FP-IDENTICAL to `horizon` sequential `stream_step_batched` T=1
    dispatches: same wave order, same quantized values, same merges) —
    and consolidate ALL lanes' `horizon`-token appends into one RMW at
    the end. Host ops per dispatch: 1 consolidated gather + 2, amortized
    over B*horizon tokens.

    GREEDY lanes are token-identical to the per-step path. Sampled lanes
    (temperature > 0) draw from the same exact distribution but along a
    DIFFERENT key sequence: this path derives per-step keys as
    (rng_seed + j, ctr) from one counter per lane per dispatch, while the
    per-step path draws a fresh engine counter per dispatch — the
    interleaving of the engine's global counter across lanes cannot be
    reproduced inside a fused program. Keys remain unique per
    (lane, step), so sampling stays valid; only greedy is pinned
    token-identical by tests.

    Requires uniform attention windows (the staged-gather precondition).
    Returns (tokens [B, horizon], stores...
    [, chosen_lp [B, horizon], top_ids [B, horizon, k], top_lps]).
    """
    from cxl_speckv_tpu.engine.sampling import decode_sampling, sample_tokens
    from cxl_speckv_tpu.ops.quant import (
        dequantize_kv, encode_for_pool, quantize_kv)
    from cxl_speckv_tpu.ops.stream_attention import (
        merge_chunk_causal, stream_context_attention_slab)

    c = config
    stores = stores_read = (k_store, v_store, ks_store, vs_store)
    L, bs = c.num_layers, k_store.shape[2]
    ops = store_ops
    wins = c.layer_windows()
    if len(set(wins)) > 1:
        raise ValueError("fused streamed decode needs uniform attention "
                         "windows (same precondition as staged gathers)")
    window = wins[0] if wins else None
    n_waves = -(-max_blocks // wave)
    table_width_ctx = n_waves * wave
    nblk = stream_decode_nblk(horizon, bs)
    rope_fs = rope_frequency_pair(c)
    Wb = min(ctx_waves if ctx_waves is not None else n_waves, n_waves) * wave

    B = packed.shape[0]
    expect = 4 + table_width_ctx + nblk + 1
    if packed.shape[1] != expect:
        raise ValueError(
            f"stream_decode_multi_batched packed width {packed.shape[1]} != "
            f"4 + {table_width_ctx} (table) + {nblk} (touched) + 1 (seed) = "
            f"{expect} — caller packed the per-token layout?")

    # ONE gather stages every lane x layer context row (host-op cost is
    # per-op, bytes nearly free — scripts/hostop_probe.py case C): B*L*Wb
    # rows in a single op, so padded dead lanes (pow2 compile bucketing)
    # add guard-row bytes but ZERO host ops
    slots_ctx = packed[:, 4:4 + Wb]                              # [B, Wb]
    rows = (slots_ctx[:, None, :] * L
            + jnp.arange(L, dtype=slots_ctx.dtype)[None, :, None])
    all_slabs = ops.gather_rows(stores_read, rows.reshape(-1))
    all_slabs = tuple(a.reshape(B, L, Wb, *a.shape[1:]) for a in all_slabs)

    outs, payloads = [], []
    for b in range(B):
        lane = packed[b]
        start, valid = lane[0], lane[1]
        temps, top_ps = decode_sampling(lane[2][None])
        ctr = lane[3].astype(jnp.uint32)
        host_row = lane[4:4 + table_width_ctx + nblk]
        tok0 = lane[-1]
        slabs = tuple(a[b] for a in all_slabs)
        lane_pi = pen_info[b][None] if pen_counts is not None else None

        def step(carry, j, *, start=start, temps=temps, top_ps=top_ps,
                 ctr=ctr, valid=valid, lane_pi=lane_pi):
            tok, slabs, pc = carry
            pos = start + j
            x = _embed(params, c, tok[None])                  # [1, H]

            def layer(x, xs):
                lp, sk, sv, sks, svs = xs
                h = _norm(x, lp["attn_norm"], c)
                q, k, v = _qkv(h, lp, c)
                q = q.reshape(1, c.num_q_heads, c.head_dim)
                k = k.reshape(1, c.num_kv_heads, c.head_dim)
                v = v.reshape(1, c.num_kv_heads, c.head_dim)
                inv_freq = pick_rope(rope_fs, window)
                q = apply_rope(q, pos[None], inv_freq)
                k = apply_rope(k, pos[None], inv_freq)
                kq, ksc = quantize_kv(k, kv_dtype)
                vq, vsc = quantize_kv(v, kv_dtype)
                k_use = dequantize_kv(kq, ksc, kv_dtype)
                v_use = dequantize_kv(vq, vsc, kv_dtype)
                carry_sc = stream_context_attention_slab(
                    q, (sk, sv, sks, svs), pos, kv_dtype, block_size=bs,
                    wave=wave, window=window, sm_scale=c.sm_scale,
                    softcap=c.attn_softcap)
                o = merge_chunk_causal(q, k_use, v_use, carry_sc,
                                       window=window, sm_scale=c.sm_scale,
                                       softcap=c.attn_softcap,
                                       sinks=lp.get("sinks"))
                x = _block_residuals(x, o.reshape(1, -1), lp, c)
                # write this token's store-encoded KV into the slab at its
                # position: step j+1 then reads exactly the bytes a fresh
                # dispatch would have gathered ("drop" covers overshoot
                # steps past the lane's allocated blocks)
                brow, offs = pos // bs, pos % bs
                sk = sk.at[brow, :, offs, :].set(
                    encode_for_pool(kq, kv_dtype)[0].astype(sk.dtype),
                    mode="drop")
                sv = sv.at[brow, :, offs, :].set(
                    encode_for_pool(vq, kv_dtype)[0].astype(sv.dtype),
                    mode="drop")
                sks = sks.at[brow, :, offs].set(ksc[0, :, 0], mode="drop")
                svs = svs.at[brow, :, offs].set(vsc[0, :, 0], mode="drop")
                return x, ((sk, sv, sks, svs),
                           (kq[0], vq[0], ksc[0, :, 0], vsc[0, :, 0]))

            x, (new_slabs, kv_rows) = jax.lax.scan(
                layer, x, (params["layers"], *slabs))
            x = _norm(x, params["final_norm"], c)
            logits = _final_logits(x, params, c)
            key = (jnp.array([rng_seed, 0], jnp.uint32)
                   + jnp.array([1, 0], jnp.uint32) * j.astype(jnp.uint32)
                   + jnp.array([0, 1], jnp.uint32) * ctr)
            if pc is not None:
                from cxl_speckv_tpu.engine.sampling import penalize_and_count

                # overshoot steps (j >= valid) are discarded host-side —
                # mask their count flag so in-dispatch penalties see only
                # tokens the engine will keep (exact match with `valid`
                # sequential per-step dispatches for greedy lanes)
                pi = lane_pi.at[0, 4].set(
                    jnp.where(j < valid, lane_pi[0, 4], lane_pi[0, 4] & ~2))
                nxt, pc = penalize_and_count(
                    logits, pi, pc,
                    lambda lg: sample_tokens(lg, temps, key, top_ps=top_ps))
                nxt = nxt[0].astype(jnp.int32)
            else:
                nxt = sample_tokens(logits, temps, key,
                                    top_ps=top_ps)[0].astype(jnp.int32)
            ys = (nxt, kv_rows)
            if logprobs_k:
                ys += (_token_logprobs(logits[0], nxt, logprobs_k),)
            return (nxt, new_slabs, pc), ys

        (_, _, pen_counts), ys = jax.lax.scan(
            step, (tok0, slabs, pen_counts),
            jnp.arange(horizon, dtype=jnp.int32))
        toks = ys[0]                                          # [h]
        kv_rows = ys[1]       # tuple of [h, L, ...] (kq, vq, ks, vs)
        chunks = tuple(a.swapaxes(0, 1) for a in kv_rows)     # [L, h, ...]
        b0 = start // bs
        touched = jax.lax.dynamic_slice(host_row, (b0,), (nblk,))
        payloads.append((touched, chunks, start % bs, valid))
        row = (toks,)
        if logprobs_k:
            row += tuple(ys[2])
        outs.append(row)

    stores = _consolidated_append(payloads, stores, stores_read, ops,
                                  kv_dtype, L)
    stacked = tuple(jnp.stack([o[i] for o in outs])
                    for i in range(len(outs[0])))
    out = (stacked[0], *stores, *stacked[1:])
    if pen_counts is not None:
        out += (pen_counts,)
    return out


# ---------------------------------------------------------------------------
# verify step (speculative decoding: score a chunk of proposed tokens)
# ---------------------------------------------------------------------------

def verify_impl(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    token_ids: jax.Array,     # [B, T] int32: [last_accepted, draft_1..draft_{T-1}]
    start_pos: jax.Array,     # [B] int32: absolute position of token_ids[:, 0]
    k_pools: jax.Array,       # [L, S, Hkv, bs, D/pack]
    v_pools: jax.Array,
    k_scales: jax.Array,
    v_scales: jax.Array,
    block_tables: jax.Array,  # [B, max_blocks] int32 (guard-clamped)
    active: jax.Array,        # [B] bool — inactive lanes scatter to guard
    *,
    use_pallas: bool = False,
    mesh=None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Target-model scoring of T tokens per sequence in one pass (the
    speculative-decoding verification step). Returns logits [B, T, V]: row t
    is the distribution for position start_pos+t+1, i.e. the verdict on
    draft token t+1 (and row T-1 samples the bonus token).

    KV for every fed token is appended (quantized) at its position; tokens
    past the accepted prefix are simply never covered by seq_len and get
    overwritten on the next append — speculative KV needs no rollback (the
    reference's lazy-invalidation philosophy,
    `speculative_prefetcher.cpp:84-97`, applied to the cache itself).

    Undecorated trace body: `verify_step` is the jitted standalone program;
    the engine's fused verify+accept round (`engine/spec.py:
    _verify_accept_program`) inlines this same trace so both spend ONE
    weight stream per round, and the fused path one dispatch.
    """
    _, attend_chunk = _attend_fns(config, use_pallas, mesh)
    c = config
    B, T = token_ids.shape
    bs = v_pools.shape[3]
    max_blocks = block_tables.shape[1]
    guard_slot = k_pools.shape[1] - 1
    rope_fs = rope_frequency_pair(c)
    positions = start_pos[:, None] + jnp.arange(T)[None, :]   # [B, T]
    x = _embed(params, c, token_ids)                          # [B, T, H]

    blk = jnp.clip(positions // bs, 0, max_blocks - 1)
    slots = jnp.take_along_axis(block_tables, blk, axis=1)    # [B, T]
    slots = jnp.where(active[:, None], slots, guard_slot)
    offs = positions % bs
    sids = scheme_id_table(kv_dtype)
    eff_dtype = KVDtype.MIXED8 if sids is not None else kv_dtype

    def layer(carry, lp, li, window):
        x, k_pools, v_pools, k_scales, v_scales = carry
        sid = sids[li] if sids is not None else None
        h = _norm(x, lp["attn_norm"], c)
        q, k, v = _qkv(h, lp, config)
        q = q.reshape(B, T, c.num_q_heads, c.head_dim)
        k = k.reshape(B, T, c.num_kv_heads, c.head_dim)
        v = v.reshape(B, T, c.num_kv_heads, c.head_dim)
        inv_freq = pick_rope(rope_fs, window)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        kp = jax.lax.dynamic_index_in_dim(k_pools, li, 0, keepdims=False)
        vp = jax.lax.dynamic_index_in_dim(v_pools, li, 0, keepdims=False)
        ksc = jax.lax.dynamic_index_in_dim(k_scales, li, 0, keepdims=False)
        vsc = jax.lax.dynamic_index_in_dim(v_scales, li, 0, keepdims=False)

        # quantize the chunk KV first and attend to the *dequantized* values,
        # so verification sees exactly what a later decode step would read
        # from the pool — otherwise fresh-f32 in-chunk KV systematically
        # disagrees with the draft's quantized-cache view near ties
        from cxl_speckv_tpu.ops.quant import dequantize_kv

        if sids is None:
            kq, ks = quantize_kv(k, kv_dtype)
            vq, vs = quantize_kv(v, kv_dtype)
            kenc = encode_for_pool(kq, kv_dtype)
            venc = encode_for_pool(vq, kv_dtype)
            k_use = dequantize_kv(kq, ks, kv_dtype)
            v_use = dequantize_kv(vq, vs, kv_dtype)
        else:
            kenc, ks = quantize_kv_dual(k, sid)
            venc, vs = quantize_kv_dual(v, sid)
            k_use = dequantize_dual(kenc, ks, sid)
            v_use = dequantize_dual(venc, vs, sid)

        o = attend_chunk(q, k_use, v_use, kp, vp, ksc, vsc,
                         block_tables, start_pos, eff_dtype, scheme_id=sid,
                         window=window, sm_scale=c.sm_scale,
                         softcap=c.attn_softcap, sinks=lp.get("sinks"))
        x = _block_residuals(x, o.reshape(B, T, -1), lp, c)
        kp = _kt_append(kp, kenc, slots, offs, bs)
        vp = vp.at[slots, :, offs].set(venc.astype(vp.dtype))
        ksc = _sc_append(ksc, ks[..., 0], slots, offs, bs)
        vsc = _sc_append(vsc, vs[..., 0], slots, offs, bs)

        k_pools = jax.lax.dynamic_update_index_in_dim(k_pools, kp, li, 0)
        v_pools = jax.lax.dynamic_update_index_in_dim(v_pools, vp, li, 0)
        k_scales = jax.lax.dynamic_update_index_in_dim(k_scales, ksc, li, 0)
        v_scales = jax.lax.dynamic_update_index_in_dim(v_scales, vsc, li, 0)
        return (x, k_pools, v_pools, k_scales, v_scales)

    x, k_pools, v_pools, k_scales, v_scales = _scan_layers(
        layer, (x, k_pools, v_pools, k_scales, v_scales),
        params["layers"], c)
    x = _norm(x, params["final_norm"], c)
    logits = _final_logits(x, params, c)
    return logits, k_pools, v_pools, k_scales, v_scales


verify_step = functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "use_pallas", "mesh"),
    donate_argnames=("k_pools", "v_pools", "k_scales", "v_scales"),
)(verify_impl)


# ---------------------------------------------------------------------------
# prefill (chunked; dense causal + pool context)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "use_pallas", "mesh"),
    donate_argnames=("k_pools", "v_pools", "k_scales", "v_scales"),
)
def prefill_chunk(
    params: Params,
    config: LlamaConfig,
    kv_dtype: KVDtype,
    token_ids: jax.Array,     # [T] int32 — one sequence's chunk (maybe padded)
    start_pos: jax.Array,     # scalar int32: absolute position of token_ids[0]
    k_pools: jax.Array,
    v_pools: jax.Array,
    k_scales: jax.Array,
    v_scales: jax.Array,
    table_row: jax.Array,     # [max_blocks] int32 for this sequence
    valid_len: jax.Array | None = None,  # scalar int32: real tokens in chunk
    *,
    use_pallas: bool = False,
    mesh=None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Prefill T prompt tokens for one sequence; returns logits for the last
    *valid* token and updated pools. Attends causally within the chunk and
    fully to the `start_pos` context tokens already quantized in the pool —
    streamed block-by-block (never materializing the dequantized context),
    with the same attention recipe as the batched prefill / verify paths.

    Chunks may be right-padded to a bucketed length for jit-cache stability;
    pad positions scatter their KV to the pool's guard slot (last slot) and
    are causally invisible to real tokens (pads come after).
    """
    _, attend_chunk = _attend_fns(config, use_pallas, mesh)

    c = config
    T = token_ids.shape[0]
    bs = v_pools.shape[3]  # v pools [L, S, Hkv, bs, D/pack]
    max_blocks = table_row.shape[0]
    guard_slot = k_pools.shape[1] - 1
    rope_fs = rope_frequency_pair(c)
    if valid_len is None:
        valid_len = jnp.int32(T)
    positions = start_pos + jnp.arange(T)
    x = _embed(params, c, token_ids)  # [T, H]

    slots = table_row[jnp.clip(positions // bs, 0, max_blocks - 1)]  # [T]
    slots = jnp.where(jnp.arange(T) < valid_len, slots, guard_slot)
    offs = positions % bs
    start1 = jnp.reshape(start_pos, (1,)).astype(jnp.int32)
    sids = scheme_id_table(kv_dtype)
    eff_dtype = KVDtype.MIXED8 if sids is not None else kv_dtype

    def layer(carry, lp, li, window):
        x, k_pools, v_pools, k_scales, v_scales = carry
        sid = sids[li] if sids is not None else None
        h = _norm(x, lp["attn_norm"], c)
        q, k, v = _qkv(h, lp, config)
        q = q.reshape(T, c.num_q_heads, c.head_dim)
        k = k.reshape(T, c.num_kv_heads, c.head_dim)
        v = v.reshape(T, c.num_kv_heads, c.head_dim)
        inv_freq = pick_rope(rope_fs, window)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        # attend to the quantize->dequantized chunk KV — exactly the values a
        # later decode step will read from the pool (keeps every prefill
        # implementation and decode numerically consistent)
        from cxl_speckv_tpu.ops.quant import dequantize_kv as _deq

        if sids is None:
            kq_pre, ks_pre = quantize_kv(k, kv_dtype)
            vq_pre, vs_pre = quantize_kv(v, kv_dtype)
            kenc = encode_for_pool(kq_pre, kv_dtype)
            venc = encode_for_pool(vq_pre, kv_dtype)
            # f32 through attention: exactly the values decode dequantizes
            # from the pool (a bf16 round-trip here diverges from decode at
            # near-ties)
            k_use = _deq(kq_pre, ks_pre, kv_dtype)
            v_use = _deq(vq_pre, vs_pre, kv_dtype)
        else:
            kenc, ks_pre = quantize_kv_dual(k, sid)
            venc, vs_pre = quantize_kv_dual(v, sid)
            k_use = dequantize_dual(kenc, ks_pre, sid)
            v_use = dequantize_dual(venc, vs_pre, sid)

        kp = jax.lax.dynamic_index_in_dim(k_pools, li, 0, keepdims=False)
        vp = jax.lax.dynamic_index_in_dim(v_pools, li, 0, keepdims=False)
        ksc = jax.lax.dynamic_index_in_dim(k_scales, li, 0, keepdims=False)
        vsc = jax.lax.dynamic_index_in_dim(v_scales, li, 0, keepdims=False)

        o = attend_chunk(q[None], k_use[None], v_use[None], kp, vp, ksc, vsc,
                         table_row[None], start1, eff_dtype, scheme_id=sid,
                         window=window, sm_scale=c.sm_scale,
                         softcap=c.attn_softcap, sinks=lp.get("sinks"))
        o = o[0].reshape(T, c.num_q_heads * c.head_dim)

        x = _block_residuals(x, o, lp, c)

        # scatter the (already) quantized chunk KV
        kp = _kt_append(kp, kenc, slots, offs, bs)
        vp = vp.at[slots, :, offs].set(venc.astype(vp.dtype))
        ksc = _sc_append(ksc, ks_pre[:, :, 0], slots, offs, bs)
        vsc = _sc_append(vsc, vs_pre[:, :, 0], slots, offs, bs)
        k_pools = jax.lax.dynamic_update_index_in_dim(k_pools, kp, li, 0)
        v_pools = jax.lax.dynamic_update_index_in_dim(v_pools, vp, li, 0)
        k_scales = jax.lax.dynamic_update_index_in_dim(k_scales, ksc, li, 0)
        v_scales = jax.lax.dynamic_update_index_in_dim(v_scales, vsc, li, 0)
        return (x, k_pools, v_pools, k_scales, v_scales)

    x, k_pools, v_pools, k_scales, v_scales = _scan_layers(
        layer, (x, k_pools, v_pools, k_scales, v_scales),
        params["layers"], c)
    x_last = jax.lax.dynamic_slice_in_dim(x, valid_len - 1, 1, axis=0)
    x_last = _norm(x_last, params["final_norm"], c)
    logits = _final_logits(x_last, params, c)[0]
    return logits, k_pools, v_pools, k_scales, v_scales


# ---------------------------------------------------------------------------
# plain forward (no cache) — for parity tests and perplexity eval
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("config",))
def forward_dense(params: Params, config: LlamaConfig, token_ids: jax.Array) -> jax.Array:
    """Full causal forward, no KV cache. token_ids [B, T] -> logits [B, T, V]."""
    c = config
    B, T = token_ids.shape
    rope_fs = rope_frequency_pair(c)
    positions = jnp.arange(T)
    x = _embed(params, c, token_ids)  # [B, T, H]
    base_causal = positions[:, None] >= positions[None, :]
    sm = c.sm_scale

    def layer(x, lp, li, window):
        causal = base_causal
        if window is not None:
            causal = causal & (
                positions[:, None] - positions[None, :] < window)
        h = _norm(x, lp["attn_norm"], c)
        q, k, v = _qkv(h, lp, config)
        q = q.reshape(B, T, c.num_q_heads, c.head_dim)
        k = k.reshape(B, T, c.num_kv_heads, c.head_dim)
        v = v.reshape(B, T, c.num_kv_heads, c.head_dim)
        inv_freq = pick_rope(rope_fs, window)
        q = apply_rope(q, positions[None], inv_freq)
        k = apply_rope(k, positions[None], inv_freq)
        qg = q.reshape(B, T, c.num_kv_heads, c.q_group, c.head_dim).astype(jnp.float32)
        s = jnp.einsum("bthgd,bshd->bhgts", qg, k.astype(jnp.float32)) * sm
        s = _soft_cap(s, c.attn_softcap)
        s = jnp.where(causal[None, None, None], s, -1e30)
        if "sinks" in lp:
            from cxl_speckv_tpu.ops.paged_attention_ref import sink_softmax
            sk = (lp["sinks"].reshape(c.num_kv_heads, c.q_group)
                  .astype(jnp.float32)[None, :, :, None, None])
            w = sink_softmax(s, sk)
        else:
            w = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhgts,bshd->bthgd", w, v.astype(jnp.float32))
        return _block_residuals(x, o.reshape(B, T, -1), lp, c)

    x = _scan_layers(layer, x, params["layers"], c)
    x = _norm(x, params["final_norm"], c)
    return _final_logits(x, params, c)
