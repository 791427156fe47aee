"""KV-quantization accuracy evaluation — the "negligible perplexity loss at
3-4x compression" claim (BASELINE.md, reference claims 99.5% accuracy
preservation).

Measures, per KV format, against the uncompressed-cache model run:
- mean KL divergence of next-token distributions
- greedy top-1 agreement
- log-prob degradation of the reference continuation

Runs the real decode path (prefill + paged decode over quantized pools) so
the numbers include every quantization effect in the serving stack.

Usage: python scripts/kv_quant_accuracy.py [--preset tiny|llama-3.2-1b]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=48)
    ap.add_argument("--decode", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cxl_speckv_tpu.config import KVDtype
    from cxl_speckv_tpu.models.configs import PRESETS
    from cxl_speckv_tpu.models.llama import (
        decode_step, forward_dense, init_params, prefill_chunk)
    from cxl_speckv_tpu.ops.quant import kv_storage_dtype

    cfg = PRESETS[args.preset]()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    total = args.prompt + args.decode
    bs, max_blocks = 16, -(-total // 16) + 1
    slots = args.seqs * max_blocks + 2

    def run(kv_dtype, tokens):
        pack = 2 if kv_dtype == KVDtype.INT4 else 1
        kt_shape = (cfg.num_layers, slots, cfg.head_dim // pack,
                    cfg.num_kv_heads * bs)
        shape = (cfg.num_layers, slots, cfg.num_kv_heads, bs, cfg.head_dim // pack)
        kp = jnp.zeros(kt_shape, kv_storage_dtype(kv_dtype))
        vp = jnp.zeros(shape, kv_storage_dtype(kv_dtype))
        sc = jnp.ones((cfg.num_layers, slots, 1,
                       cfg.num_kv_heads * bs), jnp.float32)
        vs = jnp.ones_like(sc)
        table = jnp.arange(1, max_blocks + 1, dtype=jnp.int32)[None]
        logits = []
        lg, kp, vp, sc, vs = prefill_chunk(params, cfg, kv_dtype,
                                           jnp.asarray(tokens[: args.prompt]),
                                           jnp.int32(0), kp, vp, sc, vs, table[0])
        logits.append(lg)
        for t in range(args.prompt, total):
            lg, kp, vp, sc, vs = decode_step(
                params, cfg, kv_dtype, jnp.asarray(tokens[t])[None],
                jnp.array([t], jnp.int32), kp, vp, sc, vs, table,
                jnp.array([t + 1], jnp.int32))
            logits.append(lg[0])
        return np.stack([np.asarray(x) for x in logits])

    results = {}
    for dt in (KVDtype.BF16, KVDtype.INT8, KVDtype.FP8, KVDtype.INT4):
        kls, agrees, dlps = [], [], []
        for s in range(args.seqs):
            tokens = rng.randint(1, cfg.vocab_size, total)
            ref = np.asarray(forward_dense(params, cfg,
                                           jnp.asarray(tokens)[None])[0])
            ref = ref[args.prompt - 1 :]
            got = run(dt, tokens)
            p_ref = jax.nn.softmax(jnp.asarray(ref), axis=-1)
            lp_ref = jax.nn.log_softmax(jnp.asarray(ref), axis=-1)
            lp_got = jax.nn.log_softmax(jnp.asarray(got), axis=-1)
            kls.append(float(jnp.mean(jnp.sum(p_ref * (lp_ref - lp_got), -1))))
            agrees.append(float((got.argmax(-1) == ref.argmax(-1)).mean()))
            nxt = tokens[args.prompt:]
            dlps.append(float(jnp.mean(
                jnp.take_along_axis(lp_ref[:-1], jnp.asarray(nxt)[:, None], 1)
                - jnp.take_along_axis(lp_got[:-1], jnp.asarray(nxt)[:, None], 1))))
        results[dt.value] = {
            "mean_kl": round(float(np.mean(kls)), 6),
            "greedy_agreement": round(float(np.mean(agrees)), 4),
            "logprob_delta": round(float(np.mean(dlps)), 6),
            "compression": dt.compression_ratio,
        }
        print(dt.value, results[dt.value])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
