"""Model-family configurations (Llama / Mistral / Qwen2 lineages).

The reference contains no model forward pass (SURVEY.md: "the LLM is
external", `host/python/vllm_speckv_backend.py:104-129` shows the intended
vLLM decode loop) — the model family here is the decode engine the reference
assumes exists, covering the BASELINE.json configs: Llama-3.2-1B,
Llama-3-8B, Llama-3-70B, plus the two most common architecture variants a
serving framework must host: Mistral-style sliding-window attention
(`sliding_window`, which the paged tiered cache exploits by retiring
out-of-window KV blocks) and Qwen2-style QKV projection bias (`attn_bias`).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RopeScaling:
    """Llama-3 frequency-banded rope scaling (matches HF `rope_scaling`)."""

    factor: float = 8.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position: int = 8192


@dataclass(frozen=True)
class YarnRope:
    """YaRN rope scaling (HF rope_type "yarn" — GPT-OSS). The cos/sin
    attention factor is folded into `LlamaConfig.sm_scale` as factor**2
    (cos/sin scale both q and k, so scores scale quadratically; learned
    attention sinks stay unscaled, exactly matching HF)."""
    factor: float
    original_max_position: int
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    attention_factor: float | None = None  # None = 0.1*ln(factor) + 1
    truncate: bool = True

    @property
    def attn_factor(self) -> float:
        import math
        if self.attention_factor is not None:
            return self.attention_factor
        return 0.1 * math.log(self.factor) + 1.0 if self.factor > 1 else 1.0


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_q_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rope_scaling: RopeScaling | None = None
    rms_eps: float = 1e-5
    tie_embeddings: bool = False
    max_seq_len: int = 8192
    eos_token_id: int = 128009
    dtype: str = "bfloat16"
    # Mistral-family sliding-window attention: each query attends only to
    # the last `sliding_window` positions (None = full causal). The serving
    # engine retires KV blocks that fall wholly outside every future query's
    # window, bounding live KV per sequence to ~window tokens (the paged
    # rolling buffer).
    sliding_window: int | None = None
    # Qwen2-family bias on the q/k/v projections (o/mlp stay bias-free,
    # matching HF Qwen2).
    attn_bias: bool = False
    # Qwen3/Gemma-3-family per-head RMSNorm on q and k (weight [head_dim],
    # applied after projection, before RoPE — HF q_norm/k_norm). Follows
    # the family's norm convention: plain (Qwen3) or 1+w (Gemma, via
    # `norm_offset`).
    qk_norm: bool = False
    # Gemma-3: sliding-window layers use their own RoPE base frequency
    # (HF rope_local_base_freq); global layers use `rope_theta` (+ any
    # scaling). None = every layer uses rope_theta.
    rope_local_theta: float | None = None
    # Linear (position-interpolation) RoPE scaling on the global theta
    # (HF rope_scaling type "linear", Gemma-3 factor 8). Mutually
    # exclusive with the Llama-3 banded `rope_scaling`.
    rope_linear_factor: float | None = None
    # Pallas attention matmul operand precision ("bfloat16" = native MXU
    # rate; "float32" for bit-conservative runs). Softmax statistics and
    # accumulators stay f32 either way; XLA reference paths ignore this.
    attn_compute_dtype: str = "bfloat16"
    # Mixtral-family sparse MoE MLP: >0 replaces the dense SwiGLU MLP with
    # `num_experts` expert FFNs behind a top-`num_experts_per_tok` softmax
    # router (HF MixtralSparseMoeBlock semantics). Expert weights carry a
    # leading E axis in the param tree and shard over the mesh "ep" axis
    # (`parallel/sharding.py`); see `models/moe.py` for the two compute
    # modes ("dense" weighted-combine vs "dispatch" capacity bucketing).
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_impl: str = "dense"
    moe_capacity_factor: float = 2.0
    # Gemma-2-family features. attn_pattern is a repeating per-layer
    # local/global pattern: entry i%len is True for a sliding-window layer
    # (window = sliding_window) and False for a global layer; None = every
    # layer uses `sliding_window` uniformly (Mistral). The layer scan
    # specializes windows STATICALLY by scanning one pattern-period per
    # iteration (`models/llama.py:_scan_layers`), so kernels keep static
    # windows and their DMA-elision index maps.
    attn_pattern: tuple | None = None
    attn_softcap: float | None = None    # tanh cap on attention scores
    final_softcap: float | None = None   # tanh cap on lm-head logits
    norm_offset: bool = False            # RMSNorm multiplies by (1 + w)
    post_norms: bool = False             # sandwich norms around attn/MLP
    act_fn: str = "silu"                 # "silu" | "gelu_tanh"
    embed_scale: bool = False            # scale embeddings by sqrt(H)
    query_scale: float | None = None     # softmax scale; None = D^-0.5
    # GPT-OSS-family learned attention sinks: one scalar logit per q head
    # joins every softmax denominator (an always-available "null" token
    # with no value vector) — params["layers"]["sinks"] [L, Hq].
    attn_sinks: bool = False
    # bias on the attention output projection (GPT-OSS attention_bias
    # covers o_proj too; q/k/v ride `attn_bias`)
    o_bias: bool = False
    # MoE family conventions: "mixtral" (softmax->topk->renorm, SwiGLU) or
    # "gpt_oss" (topk->softmax, biased projections, clamped activation)
    moe_style: str = "mixtral"
    # renormalize the selected top-k weights (Mixtral/Qwen3-MoE True,
    # Qwen2-MoE False — HF norm_topk_prob); ignored by "gpt_oss"
    moe_norm_topk: bool = True
    # Qwen2-MoE shared expert: a dense SwiGLU MLP of this intermediate
    # size runs on EVERY token, scaled by sigmoid(x @ shared_expert_gate)
    # and added to the routed output. 0 = no shared expert.
    moe_shared_expert: int = 0
    # YaRN rope scaling (GPT-OSS); mutually exclusive with rope_scaling /
    # rope_linear_factor
    rope_yarn: YarnRope | None = None

    @property
    def q_group(self) -> int:
        return self.num_q_heads // self.num_kv_heads

    @property
    def sm_scale(self) -> float:
        base = (self.query_scale if self.query_scale is not None
                else self.head_dim**-0.5)
        if self.rope_yarn is not None:
            # YaRN attention factor scales cos/sin -> q AND k -> scores x f^2
            base = base * self.rope_yarn.attn_factor ** 2
        return base

    def layer_windows(self) -> tuple:
        """Per-layer static sliding windows (None = global)."""
        if self.attn_pattern is None:
            return (self.sliding_window,) * self.num_layers
        return tuple(
            self.sliding_window if self.attn_pattern[i % len(self.attn_pattern)]
            else None
            for i in range(self.num_layers))

    @property
    def retirement_window(self) -> int | None:
        """Window below which KV blocks may retire engine-side: the MAX
        over layers — None (no retirement) if ANY layer attends globally."""
        wins = self.layer_windows()
        if any(w is None for w in wins):
            return None
        return max(wins)


def llama_3_2_1b() -> LlamaConfig:
    return LlamaConfig(
        hidden_size=2048, intermediate_size=8192, num_layers=16,
        num_q_heads=32, num_kv_heads=8, head_dim=64,
        rope_scaling=RopeScaling(factor=32.0), tie_embeddings=True,
        max_seq_len=131072,
    )


def llama_3_8b() -> LlamaConfig:
    return LlamaConfig(rope_scaling=RopeScaling(factor=8.0), max_seq_len=131072)


def llama_3_70b() -> LlamaConfig:
    return LlamaConfig(
        hidden_size=8192, intermediate_size=28672, num_layers=80,
        num_q_heads=64, num_kv_heads=8, head_dim=128,
        rope_scaling=RopeScaling(factor=8.0), max_seq_len=131072,
    )


def mistral_7b() -> LlamaConfig:
    """Mistral-7B-v0.1 geometry (HF `mistralai/Mistral-7B-v0.1`):
    llama-shaped with a 4096-token sliding window and theta 10000."""
    return LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_q_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=10000.0, rope_scaling=None, max_seq_len=32768,
        eos_token_id=2, sliding_window=4096,
    )


def qwen2_7b() -> LlamaConfig:
    """Qwen2-7B geometry (HF `Qwen/Qwen2-7B`): QKV bias, GQA 28/4."""
    return LlamaConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_layers=28, num_q_heads=28, num_kv_heads=4, head_dim=128,
        rope_theta=1000000.0, rope_scaling=None, max_seq_len=32768,
        eos_token_id=151643, attn_bias=True, rms_eps=1e-6,
    )


def qwen3_8b() -> LlamaConfig:
    """Qwen3-8B geometry (HF `Qwen/Qwen3-8B`): per-head QK-RMSNorm,
    bias-free, GQA 32/8."""
    return LlamaConfig(
        vocab_size=151936, hidden_size=4096, intermediate_size=12288,
        num_layers=36, num_q_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=1000000.0, rope_scaling=None, max_seq_len=40960,
        eos_token_id=151645, qk_norm=True, rms_eps=1e-6,
    )


def phi3_mini() -> LlamaConfig:
    """Phi-3-mini-4k geometry (HF `microsoft/Phi-3-mini-4k-instruct`):
    fused qkv/gate_up projections in the checkpoint (split at conversion,
    `models/hf_convert.py`), MHA (kv == q heads)."""
    return LlamaConfig(
        vocab_size=32064, hidden_size=3072, intermediate_size=8192,
        num_layers=32, num_q_heads=32, num_kv_heads=32, head_dim=96,
        rope_theta=10000.0, rope_scaling=None, max_seq_len=4096,
        eos_token_id=32000, rms_eps=1e-5,
    )


def mixtral_8x7b() -> LlamaConfig:
    """Mixtral-8x7B geometry (HF `mistralai/Mixtral-8x7B-v0.1`): Mistral
    attention shape + 8-expert top-2 sparse MoE MLP (47B params, ~13B
    active per token)."""
    return LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_q_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=1000000.0, rope_scaling=None, max_seq_len=32768,
        eos_token_id=2, num_experts=8, num_experts_per_tok=2,
    )


def gemma2_9b() -> LlamaConfig:
    """Gemma-2-9B geometry (HF `google/gemma-2-9b`): alternating
    sliding/global attention, tanh softcaps, GeGLU, sandwich norms."""
    return LlamaConfig(
        vocab_size=256000, hidden_size=3584, intermediate_size=14336,
        num_layers=42, num_q_heads=16, num_kv_heads=8, head_dim=256,
        rope_theta=10000.0, rope_scaling=None, rms_eps=1e-6,
        tie_embeddings=True, max_seq_len=8192, eos_token_id=1,
        sliding_window=4096, attn_pattern=(True, False),
        attn_softcap=50.0, final_softcap=30.0, norm_offset=True,
        post_norms=True, act_fn="gelu_tanh", embed_scale=True,
        query_scale=256.0**-0.5,
    )


def gemma3_12b() -> LlamaConfig:
    """Gemma-3-12B text geometry (HF `google/gemma-3-12b-pt` text config):
    5 sliding : 1 global pattern with per-type RoPE base frequencies,
    per-head qk-norm in the Gemma 1+w convention, no softcaps. (48 layers
    = 8 full periods; the 34-layer 4B truncates its final period, which
    the converter handles by treating the whole stack as one period.)"""
    return LlamaConfig(
        vocab_size=262208, hidden_size=3840, intermediate_size=15360,
        num_layers=48, num_q_heads=16, num_kv_heads=8, head_dim=256,
        rope_theta=1_000_000.0, rope_local_theta=10_000.0,
        rope_linear_factor=8.0, rms_eps=1e-6, tie_embeddings=True,
        max_seq_len=131072, eos_token_id=1, sliding_window=1024,
        attn_pattern=(True, True, True, True, True, False),
        qk_norm=True, norm_offset=True, post_norms=True,
        act_fn="gelu_tanh", embed_scale=True, query_scale=256.0**-0.5,
    )


def qwen2_moe_57b() -> LlamaConfig:
    """Qwen2-57B-A14B geometry (HF `Qwen/Qwen2-57B-A14B`): 64-expert top-8
    MoE without top-k renorm + a sigmoid-gated shared expert, QKV bias."""
    return LlamaConfig(
        vocab_size=151936, hidden_size=3584, intermediate_size=2560,
        num_layers=28, num_q_heads=28, num_kv_heads=4, head_dim=128,
        rope_theta=1000000.0, rms_eps=1e-6, tie_embeddings=False,
        max_seq_len=32768, eos_token_id=151643, attn_bias=True,
        num_experts=64, num_experts_per_tok=8, moe_norm_topk=False,
        moe_shared_expert=20480,
    )


def qwen3_moe_30b() -> LlamaConfig:
    """Qwen3-30B-A3B geometry (HF `Qwen/Qwen3-30B-A3B`): 128-expert top-8
    MoE with top-k renorm, per-head qk-norm, no shared expert."""
    return LlamaConfig(
        vocab_size=151936, hidden_size=2048, intermediate_size=768,
        num_layers=48, num_q_heads=32, num_kv_heads=4, head_dim=128,
        rope_theta=1000000.0, rms_eps=1e-6, tie_embeddings=False,
        max_seq_len=40960, eos_token_id=151645, qk_norm=True,
        num_experts=128, num_experts_per_tok=8, moe_norm_topk=True,
    )


def gpt_oss_20b() -> LlamaConfig:
    """GPT-OSS-20B geometry (HF `openai/gpt-oss-20b`): 32-expert top-4 MoE
    with biased projections + clamped gated activation, learned attention
    sinks, alternating sliding(128)/full attention, fully-biased attention
    projections, YaRN rope (factor 32)."""
    return LlamaConfig(
        vocab_size=201088, hidden_size=2880, intermediate_size=2880,
        num_layers=24, num_q_heads=64, num_kv_heads=8, head_dim=64,
        rope_theta=150000.0,
        rope_yarn=YarnRope(factor=32.0, original_max_position=4096,
                           beta_fast=32.0, beta_slow=1.0),
        rms_eps=1e-5, tie_embeddings=False, max_seq_len=131072,
        eos_token_id=200002, sliding_window=128,
        attn_pattern=(True, False), attn_bias=True, o_bias=True,
        attn_sinks=True, num_experts=32, num_experts_per_tok=4,
        moe_style="gpt_oss",
    )


def tiny_test_config(vocab: int = 256) -> LlamaConfig:
    """Small config for CPU tests; dims chosen to exercise GQA + TP sharding."""
    return LlamaConfig(
        vocab_size=vocab, hidden_size=64, intermediate_size=128, num_layers=2,
        num_q_heads=4, num_kv_heads=2, head_dim=16, rope_theta=10000.0,
        rms_eps=1e-5, tie_embeddings=False, max_seq_len=512, eos_token_id=0,
        dtype="float32",
    )


PRESETS = {
    "llama-3.2-1b": llama_3_2_1b,
    "llama-3-8b": llama_3_8b,
    "llama-3-70b": llama_3_70b,
    "mistral-7b": mistral_7b,
    "qwen2-7b": qwen2_7b,
    "qwen3-8b": qwen3_8b,
    "phi3-mini": phi3_mini,
    "mixtral-8x7b": mixtral_8x7b,
    "gemma2-9b": gemma2_9b,
    "gemma3-12b": gemma3_12b,
    "gpt-oss-20b": gpt_oss_20b,
    "qwen2-moe-57b": qwen2_moe_57b,
    "qwen3-moe-30b": qwen3_moe_30b,
    "tiny": tiny_test_config,
}
