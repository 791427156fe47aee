"""Pipeline parallelism: GPipe-style microbatch pipeline over a "pp" axis.

NEW relative to the reference (SURVEY.md §2.6: the reference has no
parallelism of any kind); complements dp/ep/tp for models whose layer stack
exceeds one chip's HBM when tensor-parallel sharding alone is insufficient
(or undesirable across the DCN boundary — PP's point-to-point `ppermute`
ring is the cheapest inter-host pattern per the scaling-book recipe).

TPU-native shape: the layer stack [L, ...] regroups into [S, L/S, ...]
stages sharded over the mesh "pp" axis; `shard_map` gives each device its
stage's weights, and activations flow stage-to-stage with
`lax.ppermute` — one hop per tick, S + M - 1 ticks for M microbatches
(the classic GPipe schedule; bubble fraction (S-1)/(S+M-1)).

This is the *batch-scoring/prefill* forward (no KV cache): the decode
serving path intentionally stays dp/ep/tp — at decode batch sizes a
pipeline bubble per token is strictly worse than TP's per-matmul
collectives on ICI. PP here serves throughput-oriented offline scoring
(perplexity eval, reward scoring, distillation) of models too deep/large
for one chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cxl_speckv_tpu.models.configs import LlamaConfig
from cxl_speckv_tpu.models.llama import (
    _block_residuals,
    _norm,
    _qkv,
    _soft_cap,
    apply_rope,
    pick_rope,
    rope_frequency_pair,
)
from cxl_speckv_tpu.ops.wquant import act_dtype, mm, take_rows


def _dense_layer(x, lp, config, positions, causal, window=None):
    """One dense transformer layer (no cache). x [mb, T, H]. `causal` is
    the layer's (possibly windowed) mask; softcap/norm-offset/sandwich-norm
    /qk-norm/per-layer-rope conventions follow the config (shared llama.py
    building blocks). `window` only selects the RoPE base for models with
    per-layer-type frequencies — the mask already encodes it."""
    c = config
    B, T = x.shape[:2]
    inv_freq = pick_rope(rope_frequency_pair(c), window)
    h = _norm(x, lp["attn_norm"], c)
    q, k, v = _qkv(h, lp, config)
    q = apply_rope(q.reshape(B, T, c.num_q_heads, c.head_dim), positions, inv_freq)
    k = apply_rope(k.reshape(B, T, c.num_kv_heads, c.head_dim), positions, inv_freq)
    v = v.reshape(B, T, c.num_kv_heads, c.head_dim)
    qg = q.reshape(B, T, c.num_kv_heads, c.q_group, c.head_dim).astype(jnp.float32)
    s = jnp.einsum("bthgd,bshd->bhgts", qg, k.astype(jnp.float32))
    s = _soft_cap(s * c.sm_scale, c.attn_softcap)
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


def _stage_params(params, num_stages: int):
    """Regroup stacked layers [L, ...] -> [S, L/S, ...] (stage-major)."""
    def regroup(a):
        L = a.shape[0]
        if L % num_stages:
            raise ValueError(f"num_layers={L} not divisible by pp={num_stages}")
        return a.reshape(num_stages, L // num_stages, *a.shape[1:])

    out = dict(params)
    out["layers"] = jax.tree.map(regroup, params["layers"])
    return out


@functools.partial(
    jax.jit, static_argnames=("config", "num_microbatches", "mesh"))
def pipeline_forward(
    params,
    config: LlamaConfig,
    token_ids: jax.Array,       # [B, T] int32
    *,
    mesh: Mesh,
    num_microbatches: int = 4,
) -> jax.Array:
    """Full causal forward (logits [B, T, V]) pipelined over mesh axis "pp".

    Numerically identical to `models.llama.forward_dense` (same layer math;
    the schedule only reorders *which device* runs each layer).
    """
    c = config
    S = mesh.shape["pp"]
    M = num_microbatches
    B, T = token_ids.shape
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    mb = B // M

    staged = _stage_params(params, S)
    Lps = c.num_layers // S
    wins = c.layer_windows()
    period = 1
    if len(set(wins)) > 1:
        period = len(c.attn_pattern)
        if Lps % period:
            raise ValueError(
                f"per-stage layers {Lps} not divisible by attn_pattern "
                f"period {period} — stages would misalign the pattern")
    positions = jnp.arange(T)
    base_causal = positions[:, None] >= positions[None, :]

    def mask_for(window):
        if window is None:
            return base_causal
        return base_causal & (
            positions[:, None] - positions[None, :] < window)

    head = (params["embed"].T if c.tie_embeddings else params["lm_head"])

    mbs = token_ids.reshape(M, mb, T)

    def staged_fn(layers, embed, head, final_norm, mbs):
        # per-device view: layers [1, L/S, ...] — this stage's weights
        stage = jax.lax.axis_index("pp")
        my_layers = jax.tree.map(lambda a: a[0], layers)

        def run_stage(x):
            if period == 1:
                def body(x, lp):
                    return _dense_layer(x, lp, c, positions[None],
                                        mask_for(wins[0]),
                                        window=wins[0]), None
                return jax.lax.scan(body, x, my_layers)[0]
            # alternating local/global (Gemma-2): one pattern-period per
            # scan iteration, windows static per sub-layer (stage start
            # indices are period-aligned since Lps % period == 0)
            grouped = jax.tree.map(
                lambda a: a.reshape(Lps // period, period, *a.shape[1:]),
                my_layers)

            def body(x, lps):
                for j in range(period):
                    lp = jax.tree.map(lambda a, j=j: a[j], lps)
                    x = _dense_layer(x, lp, c, positions[None],
                                     mask_for(wins[j]), window=wins[j])
                return x, None
            return jax.lax.scan(body, x, grouped)[0]

        H = embed.shape[1]
        V = head.shape[1]

        def tick(carry, t):
            x_recv, logits_buf = carry
            # stage 0 injects microbatch t (clamped; ticks past M feed a
            # dummy that never reaches the output buffer)
            inject = take_rows(embed, mbs[jnp.clip(t, 0, M - 1)],
                               dtype=jnp.dtype(c.dtype))
            if c.embed_scale:
                inject = inject * jnp.asarray(c.hidden_size**0.5, inject.dtype)
            x_in = jnp.where(stage == 0, inject.astype(x_recv.dtype), x_recv)
            y = run_stage(x_in)
            # last stage finalizes microbatch t-(S-1)
            out_idx = t - (S - 1)
            xf = _norm(y, final_norm, c)
            logits = _soft_cap(mm(xf, head).astype(jnp.float32),
                               c.final_softcap)
            valid = (stage == S - 1) & (out_idx >= 0)
            logits_buf = jax.lax.dynamic_update_index_in_dim(
                logits_buf,
                jnp.where(valid, logits,
                          jax.lax.dynamic_index_in_dim(
                              logits_buf, jnp.clip(out_idx, 0, M - 1), 0,
                              keepdims=False)),
                jnp.clip(out_idx, 0, M - 1), 0)
            x_next = jax.lax.ppermute(
                y, "pp", [(i, i + 1) for i in range(S - 1)])
            return (x_next, logits_buf), None

        x0 = jnp.zeros((mb, T, H), act_dtype(embed, c.dtype))
        buf0 = jnp.zeros((M, mb, T, V), jnp.float32)
        (_, logits_buf), _ = jax.lax.scan(
            tick, (x0, buf0), jnp.arange(S + M - 1))
        # only the last stage holds real logits; zero elsewhere + psum
        # makes the output genuinely replicated across "pp"
        logits_buf = jnp.where(stage == S - 1, logits_buf, 0.0)
        return jax.lax.psum(logits_buf, "pp")

    specs_layers = jax.tree.map(lambda _: P("pp"), staged["layers"])
    fn = jax.shard_map(
        staged_fn, mesh=mesh,
        in_specs=(specs_layers, P(), P(), P(), P()),
        out_specs=P(), check_vma=False)
    logits = fn(staged["layers"], params["embed"], head,
                params["final_norm"], mbs)
    return logits.reshape(B, T, -1)
