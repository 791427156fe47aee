"""On-hardware speculative-decoding agreement check (VERDICT r1 item 10).

Round-1 finding: greedy spec decoding agreed with plain decoding only 0.84
on the real chip under random weights — MXU rounding differences between
the verify path's XLA einsums and the Pallas decode kernel flipped near-tie
argmax picks. Round 2 unified the numerics (the verify/prefill chunk
attention is now the same Pallas dequant+f32-matmul recipe as decode,
`ops/chunk_attention_pallas.py`), so agreement should be ~1.0.

"Structured checkpoint" stand-in: random weights drawn with a larger output
scale produce sharper logit margins than plain init (trained models have
far larger margins still); we report agreement under BOTH plain and sharp
inits. Run on TPU: python scripts/tpu_spec_check.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_check(sharp: bool, cdt: str = "bfloat16", wdtype: str = "bfloat16",
              kv: str = "int8"):
    """Greedy spec-vs-plain sequence agreement. NOTE (r3, NOTES_ROUND3):
    on random weights this sequence metric is chaotic — one early
    near-tie flip re-contexts every later token — so ~0.81-0.86 plain /
    ~0.86-0.95 sharp is the bf16 hardware baseline, NOT a defect signal;
    `run_self_draft` is the cascade-free mechanism probe. For an EXACT
    on-hardware assertion use wdtype="float32", cdt="float32",
    kv="native": no quantizer/bf16 rounding cliffs to amplify the paths'
    per-program-shape accumulation differences (tpu_f32_identity.py)."""
    import jax
    import numpy as np

    from cxl_speckv_tpu.config import (
        CacheConfig, EngineConfig, KVDtype, PrefetchConfig, SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine
    from cxl_speckv_tpu.models.configs import LlamaConfig
    from cxl_speckv_tpu.models.llama import init_params

    cfg = LlamaConfig(
        vocab_size=2048, hidden_size=512, intermediate_size=1024,
        num_layers=4, num_q_heads=8, num_kv_heads=4, head_dim=64,
        rope_theta=10000.0, tie_embeddings=False, max_seq_len=512,
        eos_token_id=0, dtype=wdtype, attn_compute_dtype=cdt)
    draft = LlamaConfig(
        vocab_size=2048, hidden_size=256, intermediate_size=512,
        num_layers=2, num_q_heads=4, num_kv_heads=4, head_dim=32,
        rope_theta=10000.0, tie_embeddings=False, max_seq_len=512,
        eos_token_id=0, dtype=wdtype, attn_compute_dtype=cdt)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if sharp:
        # sharper logit margins (the trained-checkpoint stand-in)
        import jax.numpy as jnp
        params = dict(params)
        params["lm_head"] = params["lm_head"] * 3.0

    def make(spec):
        sc = SystemConfig(
            cache=CacheConfig(block_size=32, num_hbm_blocks=64,
                              num_host_blocks=128,
                              kv_dtype=KVDtype.INT8 if kv == "int8"
                              else KVDtype.BF16),
            prefetch=PrefetchConfig(enabled=False),
            engine=EngineConfig(max_batch_size=4, max_seq_len=256,
                                prefill_chunk=64))
        kw = dict(draft_config=draft, spec_gamma=4) if spec else {}
        return Engine(cfg, sc, params=params, enable_lstm=False, seed=0, **kw)

    rng = np.random.RandomState(7)
    prompts = [rng.randint(1, 2048, 24).tolist() for _ in range(6)]
    gen = 48

    t0 = time.monotonic()
    plain = make(spec=False)
    ids_p = [plain.add_request(p, max_new_tokens=gen) for p in prompts]
    outs_p = {o.req_id: o.tokens for o in plain.run()}
    spec = make(spec=True)
    ids_s = [spec.add_request(p, max_new_tokens=gen) for p in prompts]
    outs_s = {o.req_id: o.tokens for o in spec.run()}
    st = spec.get_statistics()

    tot = same = 0
    for a, b in zip(ids_p, ids_s):
        for x, y in zip(outs_p[a], outs_s[b]):
            tot += 1
            same += int(x == y)
    ident = all(outs_p[a] == outs_s[b] for a, b in zip(ids_p, ids_s))
    print(f"init={'sharp' if sharp else 'plain'}: greedy agreement "
          f"{same}/{tot} = {same/tot:.3f} identical={ident} "
          f"acceptance={st['spec'].get('acceptance_rate', 'n/a')} "
          f"({time.monotonic()-t0:.0f}s)", flush=True)
    return same / tot


def run_self_draft(cdt: str = "bfloat16"):
    """Cascade-free mechanism probe: the TARGET drafts for itself
    (draft_config == config, draft_params == params), so the acceptance
    rate IS the per-position decode-vs-verify greedy agreement — each
    round re-anchors on the verify output, no flip cascades. 1.0 means
    the two attention paths argmax-agree everywhere."""
    import jax
    import numpy as np

    from cxl_speckv_tpu.config import (
        CacheConfig, EngineConfig, KVDtype, PrefetchConfig, SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine
    from cxl_speckv_tpu.models.configs import LlamaConfig
    from cxl_speckv_tpu.models.llama import init_params

    cfg = LlamaConfig(
        vocab_size=2048, hidden_size=512, intermediate_size=1024,
        num_layers=4, num_q_heads=8, num_kv_heads=4, head_dim=64,
        rope_theta=10000.0, tie_embeddings=False, max_seq_len=512,
        eos_token_id=0, dtype="bfloat16", attn_compute_dtype=cdt)
    params = init_params(cfg, jax.random.PRNGKey(0))
    sc = SystemConfig(
        cache=CacheConfig(block_size=32, num_hbm_blocks=64,
                          num_host_blocks=128, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=4, max_seq_len=256,
                            prefill_chunk=64))
    eng = Engine(cfg, sc, params=params, enable_lstm=False, seed=0,
                 draft_config=cfg, draft_params=params, spec_gamma=4)
    rng = np.random.RandomState(7)
    for p in [rng.randint(1, 2048, 24).tolist() for _ in range(6)]:
        eng.add_request(p, max_new_tokens=48)
    t0 = time.monotonic()
    eng.run()
    st = eng.get_statistics()["spec"]
    acc = st["acceptance_rate"]
    print(f"self-draft acceptance (= per-position decode/verify argmax "
          f"agreement, cascade-free): {acc:.4f} "
          f"({time.monotonic()-t0:.0f}s)", flush=True)
    return acc


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    cdt = "float32" if "--f32" in sys.argv else "bfloat16"
    a0 = run_self_draft(cdt=cdt)
    a1 = run_check(sharp=False, cdt=cdt)
    a2 = run_check(sharp=True, cdt=cdt)
    print(f"RESULT cdt={cdt} selfdraft={a0:.4f} plain={a1:.3f} "
          f"sharp={a2:.3f}", flush=True)


if __name__ == "__main__":
    main()
