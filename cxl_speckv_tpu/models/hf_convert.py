"""HuggingFace checkpoint conversion (Llama / Mistral / Qwen2 / Qwen3 / Phi-3 / Gemma-2 / Gemma-3 families).

Maps a `transformers.{Llama,Mistral,Qwen2}ForCausalLM` state dict onto our
stacked-layer pytree (`models/llama.py:init_params` layout) — the three
families share the HF llama module naming; Mistral adds `sliding_window`,
Qwen2 adds q/k/v projection biases. Torch is only imported here (CPU,
conversion-time); the serving path is torch-free.
"""

from __future__ import annotations

import numpy as np

from cxl_speckv_tpu.models.configs import LlamaConfig, RopeScaling


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
    raw = getattr(hf_config, "rope_scaling", None)
    if raw and raw.get("rope_type", raw.get("type")) == "linear":
        linear_factor = float(raw["factor"])
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
        getattr(hf_config, "model_type", "") == "qwen2")
    model_type = getattr(hf_config, "model_type", "")
    # Qwen3 / Gemma-3: per-head q/k RMSNorm (and no projection bias)
    qk_norm = model_type in ("qwen3", "gemma3_text", "gemma3")
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
    return LlamaConfig(
        **gemma_kw,
        sliding_window=window,
        attn_bias=attn_bias,
        qk_norm=qk_norm,
        rope_linear_factor=linear_factor,
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


def params_from_hf_state_dict(state_dict, config: LlamaConfig, dtype=None):
    """Convert HF tensors (torch or numpy) to our pytree. Linear weights are
    stored [out, in] in HF; we keep [in, out] so forward is `x @ W`."""
    import jax.numpy as jnp

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
    if config.num_experts > 0:
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
    if config.qk_norm:
        # Qwen3 per-head q/k RMSNorm weights [head_dim]
        p["layers"]["q_norm"] = stack(
            "model.layers.{}.self_attn.q_norm.weight", transpose=False)
        p["layers"]["k_norm"] = stack(
            "model.layers.{}.self_attn.k_norm.weight", transpose=False)
    if not config.tie_embeddings:
        p["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype=dtype)
    return p
