"""HuggingFace checkpoint conversion (Llama / Mistral / Qwen2 / Qwen3 / Phi-3 / Gemma-2 / Gemma-3 / Mixtral / GPT-OSS families).

Maps a `transformers.{Llama,Mistral,Qwen2}ForCausalLM` state dict onto our
stacked-layer pytree (`models/llama.py:init_params` layout) — the three
families share the HF llama module naming; Mistral adds `sliding_window`,
Qwen2 adds q/k/v projection biases. Torch is only imported here (CPU,
conversion-time); the serving path is torch-free.
"""

from __future__ import annotations

import numpy as np

from cxl_speckv_tpu.models.configs import LlamaConfig, RopeScaling, YarnRope


def _pattern_from_layer_types(hf_config) -> tuple:
    """Reduce HF layer_types to the smallest repeating (is_sliding, ...)
    period (HF stores the full per-layer list)."""
    types = list(hf_config.layer_types)
    pattern = tuple(t == "sliding_attention" for t in types)
    for p in range(1, len(pattern) + 1):
        if len(pattern) % p == 0 and all(
                pattern[i] == pattern[i % p] for i in range(len(pattern))):
            return pattern[:p]
    return pattern


def config_from_hf(hf_config) -> LlamaConfig:
    rs = None
    linear_factor = None
    yarn = None
    raw = getattr(hf_config, "rope_scaling", None)
    if raw and raw.get("rope_type", raw.get("type")) == "linear":
        linear_factor = float(raw["factor"])
    elif raw and raw.get("rope_type", raw.get("type")) == "yarn":
        yarn = YarnRope(
            factor=float(raw["factor"]),
            original_max_position=int(
                raw.get("original_max_position_embeddings")
                or hf_config.max_position_embeddings),
            beta_fast=float(raw.get("beta_fast") or 32),
            beta_slow=float(raw.get("beta_slow") or 1),
            attention_factor=raw.get("attention_factor"),
            truncate=bool(raw.get("truncate", True)),
        )
    elif raw and raw.get("rope_type", raw.get("type")) == "llama3":
        rs = RopeScaling(
            factor=raw["factor"],
            low_freq_factor=raw["low_freq_factor"],
            high_freq_factor=raw["high_freq_factor"],
            original_max_position=raw["original_max_position_embeddings"],
        )
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads
    )
    eos = hf_config.eos_token_id
    if isinstance(eos, (list, tuple)):
        eos = eos[0]
    # Mistral: sliding-window attention; some configs carry the field but
    # disable it via use_sliding_window=False (Qwen2 default).
    window = getattr(hf_config, "sliding_window", None)
    if window is not None and not getattr(hf_config, "use_sliding_window", True):
        window = None
    # Qwen2: q/k/v projection biases (attention_bias covers Llama variants)
    attn_bias = bool(getattr(hf_config, "attention_bias", False)) or (
        getattr(hf_config, "model_type", "") in ("qwen2", "qwen2_moe"))
    model_type = getattr(hf_config, "model_type", "")
    # Qwen3 / Gemma-3: per-head q/k RMSNorm (and no projection bias)
    qk_norm = model_type in ("qwen3", "qwen3_moe", "gemma3_text", "gemma3")
    if model_type == "phi3" and raw:
        raise NotImplementedError("phi3 longrope scaling not supported; "
                                  "use a config with rope_scaling=None")
    # Gemma-2: alternating local/global attention, tanh softcaps, GeGLU,
    # sandwich norms, scaled embeddings, query_pre_attn_scalar
    gemma_kw = {}
    if model_type == "gemma2":
        gemma_kw = dict(
            attn_pattern=_pattern_from_layer_types(hf_config),
            attn_softcap=hf_config.attn_logit_softcapping,
            final_softcap=hf_config.final_logit_softcapping,
            norm_offset=True, post_norms=True, act_fn="gelu_tanh",
            embed_scale=True,
            query_scale=float(hf_config.query_pre_attn_scalar) ** -0.5,
        )
    elif model_type == "gpt_oss":
        # GPT-OSS: learned attention sinks, fully-biased attention
        # projections, clamped-activation MoE with biased experts
        gemma_kw = dict(
            attn_pattern=_pattern_from_layer_types(hf_config),
            attn_sinks=True, o_bias=True, moe_style="gpt_oss",
        )
    elif model_type in ("gemma3_text", "gemma3"):
        # Gemma-3: the softcaps are gone (qk-norm replaces them); sliding
        # layers get their own RoPE base frequency
        gemma_kw = dict(
            attn_pattern=_pattern_from_layer_types(hf_config),
            norm_offset=True, post_norms=True, act_fn="gelu_tanh",
            embed_scale=True,
            query_scale=float(hf_config.query_pre_attn_scalar) ** -0.5,
            rope_local_theta=float(hf_config.rope_local_base_freq),
        )
    # Qwen2/Qwen3-MoE: per-expert intermediate size is moe_intermediate_size
    # (config.intermediate_size is the dense-MLP width, unused with MoE);
    # Qwen2-MoE adds the sigmoid-gated shared expert and keeps raw top-k
    # probabilities (norm_topk_prob=False)
    moe_kw = {}
    if model_type in ("qwen2_moe", "qwen3_moe"):
        if (getattr(hf_config, "decoder_sparse_step", 1) != 1
                or getattr(hf_config, "mlp_only_layers", [])):
            raise NotImplementedError(
                "mixed dense/sparse Qwen-MoE layer layouts not supported")
        moe_kw = dict(
            num_experts=hf_config.num_experts,
            intermediate_size=hf_config.moe_intermediate_size,
            moe_norm_topk=bool(hf_config.norm_topk_prob),
            moe_shared_expert=getattr(
                hf_config, "shared_expert_intermediate_size", 0) or 0,
        )
    kw = dict(
        **gemma_kw,
        sliding_window=window,
        attn_bias=attn_bias or model_type == "gpt_oss",
        qk_norm=qk_norm,
        rope_linear_factor=linear_factor,
        rope_yarn=yarn,
        # Mixtral: sparse-MoE MLP
        num_experts=getattr(hf_config, "num_local_experts", 0) or 0,
        num_experts_per_tok=getattr(hf_config, "num_experts_per_tok", 2) or 2,
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_q_heads=hf_config.num_attention_heads,
        num_kv_heads=hf_config.num_key_value_heads,
        head_dim=head_dim,
        rope_theta=hf_config.rope_theta,
        rope_scaling=rs,
        rms_eps=hf_config.rms_norm_eps,
        tie_embeddings=hf_config.tie_word_embeddings,
        max_seq_len=hf_config.max_position_embeddings,
        eos_token_id=eos if eos is not None else -1,
    )
    kw.update(moe_kw)
    return LlamaConfig(**kw)


def params_from_hf_state_dict(state_dict, config: LlamaConfig, dtype=None,
                              weight_dtype: str = "native",
                              host: bool | None = None):
    """Convert HF tensors (torch or numpy) to our pytree. Linear weights are
    stored [out, in] in HF; we keep [in, out] so forward is `x @ W`.

    weight_dtype "int8"/"int4" quantizes AT CONVERSION TIME (W8A16/W4A16,
    `ops/wquant.quantize_weights`) — required for 8B-scale checkpoints on
    a 16 GB chip, where the full-precision tree must never exist on
    device. host=True (the default whenever weight_dtype != "native")
    builds and quantizes the tree on the CPU backend, then uploads the
    QUANTIZED leaves to the default accelerator device in one
    device_put — device peak is the quantized size, and the weights are
    device-committed (CPU-committed leaves would re-transfer on every
    dispatch). The math is identical to the engine's on-device
    `weight_dtype` quantization (same quantize_weights, f32)."""
    import jax
    import jax.numpy as jnp

    if host is None:
        host = weight_dtype != "native"
    if host:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            p = params_from_hf_state_dict(
                state_dict, config, dtype=dtype, weight_dtype=weight_dtype,
                host=False)
        dev = jax.devices()[0]
        if dev == cpu:
            return p
        return jax.device_put(p, dev)
    dtype = dtype or jnp.dtype(config.dtype)

    def get(name):
        t = state_dict[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t, dtype=np.float32)

    L = config.num_layers
    qd = config.num_q_heads * config.head_dim
    kvd = config.num_kv_heads * config.head_dim

    def stack(fmt, transpose=True):
        ws = [get(fmt.format(i)) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws), dtype=dtype)

    fused = f"model.layers.0.self_attn.qkv_proj.weight" in state_dict
    if fused:
        # Phi-3 family: qkv_proj fuses [q; k; v] rows and gate_up_proj
        # fuses [gate; up] — split into our separate [in, out] weights
        qkv = stack("model.layers.{}.self_attn.qkv_proj.weight")  # [L, H, qd+2kvd]
        q_w, k_w, v_w = (qkv[:, :, :qd], qkv[:, :, qd:qd + kvd],
                         qkv[:, :, qd + kvd:])
    else:
        q_w = stack("model.layers.{}.self_attn.q_proj.weight")
        k_w = stack("model.layers.{}.self_attn.k_proj.weight")
        v_w = stack("model.layers.{}.self_attn.v_proj.weight")
    p = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype=dtype),
        "layers": {
            "attn_norm": stack("model.layers.{}.input_layernorm.weight", transpose=False),
            "q": q_w,
            "k": k_w,
            "v": v_w,
            "o": stack("model.layers.{}.self_attn.o_proj.weight"),
            "mlp_norm": stack("model.layers.{}.post_attention_layernorm.weight", transpose=False),
        },
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype=dtype),
    }
    if config.post_norms:
        # Gemma-2 sandwich norms: post_attention_layernorm is the POST-attn
        # norm (the MLP pre-norm is pre_feedforward_layernorm)
        p["layers"]["post_attn_norm"] = p["layers"].pop("mlp_norm")
        p["layers"]["mlp_norm"] = stack(
            "model.layers.{}.pre_feedforward_layernorm.weight", transpose=False)
        p["layers"]["post_mlp_norm"] = stack(
            "model.layers.{}.post_feedforward_layernorm.weight", transpose=False)
    if config.num_experts > 0 and config.moe_style == "gpt_oss":
        # GPT-OSS MoE: mlp.router (biased) + fused mlp.experts.gate_up_proj
        # [E, H, 2I] stored input-major (bmm layout) with INTERLEAVED
        # gate/up columns ([..., ::2] / [..., 1::2]), all biased
        p["layers"]["router"] = stack("model.layers.{}.mlp.router.weight")
        p["layers"]["router_bias"] = stack(
            "model.layers.{}.mlp.router.bias", transpose=False)
        gu = stack("model.layers.{}.mlp.experts.gate_up_proj",
                   transpose=False)                     # [L, E, H, 2I]
        gub = stack("model.layers.{}.mlp.experts.gate_up_proj_bias",
                    transpose=False)                    # [L, E, 2I]
        p["layers"]["gate"] = gu[..., ::2]
        p["layers"]["up"] = gu[..., 1::2]
        p["layers"]["gate_bias"] = gub[..., ::2]
        p["layers"]["up_bias"] = gub[..., 1::2]
        p["layers"]["down"] = stack("model.layers.{}.mlp.experts.down_proj",
                                    transpose=False)    # [L, E, I, H]
        p["layers"]["down_bias"] = stack(
            "model.layers.{}.mlp.experts.down_proj_bias", transpose=False)
    elif (config.num_experts > 0
          and "model.layers.0.mlp.gate.weight" in state_dict):
        # Qwen2/Qwen3-MoE: mlp.gate is the router; experts use llama-style
        # gate_proj/up_proj/down_proj names with a leading E axis
        E = config.num_experts

        def stack_experts_q(wname):
            ws = [
                np.stack([
                    get(f"model.layers.{i}.mlp.experts.{e}.{wname}.weight").T
                    for e in range(E)
                ])
                for i in range(L)
            ]
            return jnp.asarray(np.stack(ws), dtype=dtype)

        p["layers"]["router"] = stack("model.layers.{}.mlp.gate.weight")
        p["layers"]["gate"] = stack_experts_q("gate_proj")
        p["layers"]["up"] = stack_experts_q("up_proj")
        p["layers"]["down"] = stack_experts_q("down_proj")
        if config.moe_shared_expert > 0:
            p["layers"]["shared_gate"] = stack(
                "model.layers.{}.mlp.shared_expert.gate_proj.weight")
            p["layers"]["shared_up"] = stack(
                "model.layers.{}.mlp.shared_expert.up_proj.weight")
            p["layers"]["shared_down"] = stack(
                "model.layers.{}.mlp.shared_expert.down_proj.weight")
            # HF stores [1, H]; ours is [H]
            seg = stack("model.layers.{}.mlp.shared_expert_gate.weight",
                        transpose=False)
            p["layers"]["shared_expert_gate"] = seg[:, 0, :]
    elif config.num_experts > 0:
        # Mixtral MoE: block_sparse_moe.gate is the router [E, H] (-> [H, E]);
        # experts[e].w1/w3/w2 map to gate/up/down with a leading E axis
        E = config.num_experts

        def stack_experts(wname):
            ws = [
                np.stack([
                    get(f"model.layers.{i}.block_sparse_moe.experts.{e}.{wname}.weight").T
                    for e in range(E)
                ])
                for i in range(L)
            ]
            return jnp.asarray(np.stack(ws), dtype=dtype)

        p["layers"]["router"] = stack(
            "model.layers.{}.block_sparse_moe.gate.weight")
        p["layers"]["gate"] = stack_experts("w1")
        p["layers"]["up"] = stack_experts("w3")
        p["layers"]["down"] = stack_experts("w2")
    elif fused:
        gu = stack("model.layers.{}.mlp.gate_up_proj.weight")  # [L, H, 2I]
        I = config.intermediate_size
        p["layers"]["gate"] = gu[:, :, :I]
        p["layers"]["up"] = gu[:, :, I:]
        p["layers"]["down"] = stack("model.layers.{}.mlp.down_proj.weight")
    else:
        p["layers"]["gate"] = stack("model.layers.{}.mlp.gate_proj.weight")
        p["layers"]["up"] = stack("model.layers.{}.mlp.up_proj.weight")
        p["layers"]["down"] = stack("model.layers.{}.mlp.down_proj.weight")
    if config.attn_bias:
        for ours, hf in (("q_bias", "q_proj"), ("k_bias", "k_proj"),
                         ("v_bias", "v_proj")):
            p["layers"][ours] = stack(
                f"model.layers.{{}}.self_attn.{hf}.bias", transpose=False)
    if config.attn_sinks:
        p["layers"]["sinks"] = stack("model.layers.{}.self_attn.sinks",
                                     transpose=False)
    if config.o_bias:
        p["layers"]["o_bias"] = stack(
            "model.layers.{}.self_attn.o_proj.bias", transpose=False)
    if config.qk_norm:
        # Qwen3 per-head q/k RMSNorm weights [head_dim]
        p["layers"]["q_norm"] = stack(
            "model.layers.{}.self_attn.q_norm.weight", transpose=False)
        p["layers"]["k_norm"] = stack(
            "model.layers.{}.self_attn.k_norm.weight", transpose=False)
    if not config.tie_embeddings:
        p["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype=dtype)
    if weight_dtype != "native":
        from cxl_speckv_tpu.ops.wquant import quantize_weights
        if weight_dtype not in ("int8", "int4"):
            raise ValueError(f"weight_dtype must be native/int8/int4, "
                             f"got {weight_dtype!r}")
        p = quantize_weights(p, bits=8 if weight_dtype == "int8" else 4)
    return p
