"""On-hardware token-identity assertions under f32 compute (r5, VERDICT
r4 weak #3 / next-step #6).

Since r3 the on-hardware identity story for streamed-vs-pooled and
spec-vs-greedy rested on a near-tie argument: accumulation-order
differences between the paths' differently-shaped programs flip argmax
picks only at logit near-ties. This script converts that argument into
on-hardware ASSERTIONS — and the r5 first run sharpened what is actually
assertable on real hardware:

  With INT8 KV, the two paths are NOT byte-identical on the TPU even at
  f32 compute: the prefill K/V projections run in differently-shaped
  programs whose MXU tilings accumulate to ~1e-7 relative differences,
  and the quantizer's round() turns a 1e-7 nudge at a rounding boundary
  into a full 1-LSB (~8e-3) KV delta. Measured on hardware (r5 diag):
  cross-path chosen-token logprob deltas up to ~2e-2 under f32, and the
  one observed token divergence was a genuine 7.7e-3 near-tie where the
  streamed path picked the pooled path's #2. On CPU the same programs
  are bit-deterministic and the suite pins EXACT identity
  (tests/test_streaming.py); the quantization-rounding amplification is
  a property of comparing different program shapes on real hardware,
  not of the streaming machinery.

Assertions (all greedy, default backend — the real TPU under axon):
  1. NATIVE (bf16) KV: host-STREAMED == POOLED generation EXACTLY, and
     fused streamed decode (horizon=8) == per-step streamed EXACTLY —
     no quantizer, no rounding cliff, so f32 compute leaves margins
     ~1e-2 against path deltas ~1e-6.
  2. INT8 KV: quantified envelope — on agreeing steps the cross-path
     chosen-token logprob delta is < EPS; at the first divergence the
     pooled top-2 margin is < EPS and the streamed pick is pooled's #2
     (i.e. every divergence IS a near-tie inside the measured numeric
     envelope, never a wrong distribution).
  3. speculative (draft) greedy vs plain greedy at f32 weights/compute:
     the same envelope assertion. This leg is NOT exact even at native
     KV (r5 measured 284/288): KV STORAGE is bf16, and the draft/verify
     programs' per-shape accumulation differences vs plain decode
     occasionally cross a bf16 rounding boundary at KV-append — the
     int8 cliff mechanism, one dtype finer. The acceptance/correction
     LOGIC is pinned exactly on CPU (tests/test_spec_decode.py).

Run: python scripts/tpu_f32_identity.py      (~10 min first compile)
Archived result goes in NOTES_ROUND5.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# measured cross-program numeric envelope for int8 KV under f32 compute
# (r5 diag: deltas <= 2.2e-2 over 40 agreeing steps; headroom 3x)
EPS = 0.06


def _cfg():
    from cxl_speckv_tpu.models.configs import LlamaConfig
    return LlamaConfig(
        vocab_size=2048, hidden_size=512, intermediate_size=1024,
        num_layers=4, num_q_heads=8, num_kv_heads=4, head_dim=64,
        rope_theta=10000.0, tie_embeddings=False, max_seq_len=4096,
        eos_token_id=0, dtype="float32", attn_compute_dtype="float32")


def _engine(cfg, params, *, hbm, host, max_seq, horizon=1, chunk=64,
            kv="int8"):
    from cxl_speckv_tpu.config import (
        CacheConfig, EngineConfig, KVDtype, PrefetchConfig, SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine
    sc = SystemConfig(
        cache=CacheConfig(block_size=32, num_hbm_blocks=hbm,
                          num_host_blocks=host,
                          kv_dtype=KVDtype.INT8 if kv == "int8"
                          else KVDtype.BF16),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=max_seq,
                            prefill_chunk=chunk, decode_horizon=horizon,
                            stream_wave=8))
    return Engine(cfg, sc, params=params, enable_lstm=False, seed=0)


def _serve(engine, prompts, gen, logprobs=0):
    ids = [engine.add_request(p, max_new_tokens=gen, logprobs=logprobs)
           for p in prompts]
    outs = {o.req_id: o for o in engine.run()}
    return [outs[i] for i in ids]


def _prompts():
    import numpy as np
    rng = np.random.RandomState(11)
    return [rng.randint(1, 2048, 300).tolist() for _ in range(2)]


def check_native_exact():
    """bf16 ("native") KV: machinery identity is EXACT on hardware."""
    import jax
    from cxl_speckv_tpu.models.llama import init_params
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    prompts, gen = _prompts(), 24

    t0 = time.monotonic()
    pooled = _serve(_engine(cfg, params, hbm=64, host=0, max_seq=512,
                            kv="native"), prompts, gen)
    # tight engine: 300+24 tokens exceed max_seq_len=128 -> streamed path
    tight = _engine(cfg, params, hbm=8, host=64, max_seq=128, kv="native")
    streamed = _serve(tight, prompts, gen)
    st = tight.get_statistics()["engine"]
    assert st["stream_tokens"] > 0, "tight engine did not stream"
    ident = [o.tokens for o in pooled] == [o.tokens for o in streamed]
    print(f"native-KV streamed==pooled (f32): {ident} "
          f"({st['stream_tokens']} streamed tokens, "
          f"{time.monotonic()-t0:.0f}s)", flush=True)
    assert ident, ([o.tokens for o in pooled], [o.tokens for o in streamed])

    t0 = time.monotonic()
    fused = _serve(_engine(cfg, params, hbm=8, host=64, max_seq=128,
                           horizon=8, kv="native"), prompts, gen)
    ident2 = [o.tokens for o in fused] == [o.tokens for o in streamed]
    print(f"native-KV fused(h=8)==per-step (f32): {ident2} "
          f"({time.monotonic()-t0:.0f}s)", flush=True)
    assert ident2


def _assert_envelope(a_outs, b_outs, label):
    """Token streams agree within the measured int8 numeric envelope:
    exact agreement except at sub-EPS near-ties, where the other path's
    pick is this path's #2 inside EPS; cross-path logprob deltas < EPS
    on every agreeing step (compared up to the first divergence — after
    it the KV histories legitimately differ)."""
    worst_d, n_agree, n_div = 0.0, 0, 0
    for a, b in zip(a_outs, b_outs):
        for j, (ta, tb) in enumerate(zip(a.tokens, b.tokens)):
            la, lb = a.logprobs[j], b.logprobs[j]
            if ta == tb:
                d = abs(la["logprob"] - lb["logprob"])
                worst_d = max(worst_d, d)
                n_agree += 1
                assert d < EPS, (label, j, ta, d)
                continue
            # divergence: must be a near-tie — a's margin sub-EPS and
            # b's pick is a's #2 (same two candidates, swapped order)
            margin = la["top_logprobs"][0] - la["top_logprobs"][1]
            n_div += 1
            assert margin < EPS, (label, j, "margin", margin)
            assert tb == la["top_ids"][1], (label, j, la["top_ids"], tb)
            assert ta == lb["top_ids"][1], (label, j, lb["top_ids"], ta)
            break  # histories differ from here on; stop comparing lane
    print(f"envelope {label}: {n_agree} steps agree "
          f"(worst cross-path dlp {worst_d:.1e}), {n_div} divergences — "
          f"all sub-{EPS} near-ties", flush=True)


def check_int8_envelope():
    import jax
    from cxl_speckv_tpu.models.llama import init_params
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    prompts, gen = _prompts(), 24

    t0 = time.monotonic()
    pooled = _serve(_engine(cfg, params, hbm=64, host=0, max_seq=512),
                    prompts, gen, logprobs=2)
    streamed = _serve(_engine(cfg, params, hbm=8, host=64, max_seq=128),
                      prompts, gen, logprobs=2)
    _assert_envelope(pooled, streamed, "streamed-vs-pooled")
    fused = _serve(_engine(cfg, params, hbm=8, host=64, max_seq=128,
                           horizon=8), prompts, gen, logprobs=2)
    _assert_envelope(streamed, fused, "fused-vs-per-step")
    print(f"int8 envelope checks {time.monotonic()-t0:.0f}s", flush=True)


def check_spec_envelope():
    """spec-vs-greedy under f32 weights/compute + native KV. Unlike the
    streamed checks this one is NOT exact on hardware (r5 measured
    284/288): even at f32 compute the KV STORE is bf16, and the draft/
    verify programs' ~1e-7 accumulation differences vs the plain decode
    program occasionally cross a bf16 rounding boundary at KV-append —
    the same cliff mechanism as int8, one dtype finer. So the spec leg
    gets the same quantified envelope: every divergence must be a
    sub-EPS near-tie with swapped top-2."""
    import jax
    from cxl_speckv_tpu.config import (
        CacheConfig, EngineConfig, KVDtype, PrefetchConfig, SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine
    from cxl_speckv_tpu.models.configs import LlamaConfig
    from cxl_speckv_tpu.models.llama import init_params
    import numpy as np

    cfg = _cfg()
    draft = LlamaConfig(
        vocab_size=2048, hidden_size=256, intermediate_size=512,
        num_layers=2, num_q_heads=4, num_kv_heads=4, head_dim=32,
        rope_theta=10000.0, tie_embeddings=False, max_seq_len=512,
        eos_token_id=0, dtype="float32", attn_compute_dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    draft_params = init_params(draft, jax.random.PRNGKey(1))

    def make(spec):
        sc = SystemConfig(
            cache=CacheConfig(block_size=32, num_hbm_blocks=64,
                              num_host_blocks=128, kv_dtype=KVDtype.BF16),
            prefetch=PrefetchConfig(enabled=False),
            engine=EngineConfig(max_batch_size=4, max_seq_len=256,
                                prefill_chunk=64, decode_horizon=1))
        kw = (dict(draft_config=draft, draft_params=draft_params,
                   spec_gamma=4) if spec else {})
        return Engine(cfg, sc, params=params, enable_lstm=False, seed=0,
                      **kw)

    rng = np.random.RandomState(7)
    prompts = [rng.randint(1, 2048, 24).tolist() for _ in range(6)]
    t0 = time.monotonic()
    plain = _serve(make(spec=False), prompts, 48, logprobs=2)
    spec = _serve(make(spec=True), prompts, 48, logprobs=2)
    _assert_envelope(plain, spec, "spec-vs-greedy")
    print(f"spec envelope check {time.monotonic()-t0:.0f}s", flush=True)


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    check_native_exact()
    check_int8_envelope()
    check_spec_envelope()
    print("RESULT: on-hardware f32 identities hold — EXACT at native KV "
          "for the streamed machinery (streamed==pooled, fused==per-step); "
          "int8-KV and spec divergences are quantified sub-EPS "
          "rounding-cliff near-ties (see module docstring)", flush=True)


if __name__ == "__main__":
    main()
