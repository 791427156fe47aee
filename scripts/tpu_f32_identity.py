"""On-hardware EXACT token-identity check under f32 compute (r5, VERDICT
r4 weak #3 / next-step #6).

Since r3 the on-hardware identity story for streamed-vs-pooled and
spec-vs-greedy rested on a near-tie argument: bf16 MXU accumulation-order
differences between the paths flip argmax picks only at logit near-ties,
which trained checkpoints' margins avoid. This script converts the argument
into an on-hardware ASSERTION by removing the near-ties at the source: f32
params + f32 attention compute (`attn_compute_dtype="float32"`), where the
paths' accumulation-order differences are ~1e-6 relative — far below any
random-init argmax margin.

Checks (all greedy, all on the default backend — the real TPU under axon):
  1. host-STREAMED generation == POOLED generation, token for token
     (same prompts served by a tight engine that routes them through the
     host tier wave-by-wave vs an ample pooled engine)
  2. fused streamed decode (horizon=8) == per-step streamed (horizon=1)
  3. speculative (draft) greedy == plain greedy  [reuses tpu_spec_check's
     engines at cdt=float32]

Run: python scripts/tpu_f32_identity.py      (~10 min first compile)
Archived result goes in NOTES_ROUND5.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _cfg():
    from cxl_speckv_tpu.models.configs import LlamaConfig
    return LlamaConfig(
        vocab_size=2048, hidden_size=512, intermediate_size=1024,
        num_layers=4, num_q_heads=8, num_kv_heads=4, head_dim=64,
        rope_theta=10000.0, tie_embeddings=False, max_seq_len=4096,
        eos_token_id=0, dtype="float32", attn_compute_dtype="float32")


def _engine(cfg, params, *, hbm, host, max_seq, horizon=1, chunk=64):
    from cxl_speckv_tpu.config import (
        CacheConfig, EngineConfig, KVDtype, PrefetchConfig, SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine
    sc = SystemConfig(
        cache=CacheConfig(block_size=32, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=max_seq,
                            prefill_chunk=chunk, decode_horizon=horizon,
                            stream_wave=8))
    return Engine(cfg, sc, params=params, enable_lstm=False, seed=0)


def check_streamed_vs_pooled():
    import jax
    import numpy as np
    from cxl_speckv_tpu.models.llama import init_params

    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(11)
    prompts = [rng.randint(1, 2048, 300).tolist() for _ in range(2)]
    gen = 24

    t0 = time.monotonic()
    pooled = _engine(cfg, params, hbm=64, host=0, max_seq=512)
    idp = [pooled.add_request(p, max_new_tokens=gen) for p in prompts]
    outp = {o.req_id: o.tokens for o in pooled.run()}
    outs_p = [outp[i] for i in idp]
    # tight engine: 300+24 tokens exceed max_seq_len=128 -> streamed path
    tight = _engine(cfg, params, hbm=8, host=64, max_seq=128)
    ids = [tight.add_request(p, max_new_tokens=gen) for p in prompts]
    outs = {o.req_id: o.tokens for o in tight.run()}
    outs_s = [outs[i] for i in ids]
    st = tight.get_statistics()["engine"]
    assert st["stream_tokens"] > 0, "tight engine did not stream"
    ident = outs_p == outs_s
    print(f"streamed==pooled (f32): {ident} "
          f"({st['stream_tokens']} streamed tokens, "
          f"{time.monotonic()-t0:.0f}s)", flush=True)
    assert ident, (outs_p, outs_s)

    # fused streamed horizon vs per-step streamed
    t0 = time.monotonic()
    fused = _engine(cfg, params, hbm=8, host=64, max_seq=128, horizon=8)
    idf = [fused.add_request(p, max_new_tokens=gen) for p in prompts]
    outf = {o.req_id: o.tokens for o in fused.run()}
    ident2 = [outf[i] for i in idf] == outs_s
    print(f"fused-streamed(h=8)==per-step-streamed (f32): {ident2} "
          f"({time.monotonic()-t0:.0f}s)", flush=True)
    assert ident2
    return True


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    check_streamed_vs_pooled()
    # spec == greedy under f32 compute: the existing harness, f32 mode
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import tpu_spec_check as tsc
    a = tsc.run_check(sharp=False, cdt="float32")
    assert a == 1.0, f"spec-vs-greedy f32 agreement {a} != 1.0"
    print("RESULT: all f32 on-hardware identities EXACT "
          "(streamed==pooled, fused==per-step, spec==greedy)", flush=True)


if __name__ == "__main__":
    main()
