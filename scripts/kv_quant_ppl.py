"""Prompt-perplexity impact of KV quantization, via echo scoring.

The north-star accuracy claim is "negligible perplexity loss at 3-4x KV
compression" (BASELINE.md; reference claims 99.5% accuracy preservation,
`/root/reference/README.md:121`). The engine's prompt-logprobs path scores
every prompt token through the REAL serving machinery — chunked prefill
attending over the quantized paged pools — so the per-scheme perplexity
delta vs the bf16 pool isolates exactly the quantization effect.

Usage (CPU by default; tiny random-weight config unless --preset):
    python scripts/kv_quant_ppl.py [--seqs 8] [--len 96]
"""

import argparse
import math
import os
import sys

os.environ.setdefault("SPECKV_INTERPRET", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("KVPPL_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from cxl_speckv_tpu.config import (
    CacheConfig,
    EngineConfig,
    KVDtype,
    PrefetchConfig,
    SystemConfig,
)
from cxl_speckv_tpu.engine import Engine
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import init_params

COMPRESSION = {KVDtype.BF16: 1.0, KVDtype.INT8: 2.0, KVDtype.FP8: 2.0,
               KVDtype.INT4: 4.0}


def mean_nll(cfg, params, scheme, prompts, chunk, weight_dtype="native"):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=512,
                          num_host_blocks=512, kv_dtype=scheme),
        prefetch=PrefetchConfig(depth=2),
        engine=EngineConfig(max_batch_size=4,
                            max_seq_len=max(len(p) for p in prompts) + 8,
                            prefill_chunk=chunk, weight_dtype=weight_dtype),
    )
    eng = Engine(cfg, sc, params=params, use_pallas=False, enable_lstm=False)
    ids = [eng.add_request(p, max_new_tokens=1, prompt_logprobs=True)
           for p in prompts]
    outs = {o.req_id: o for o in eng.run()}
    nll, n = 0.0, 0
    for i in ids:
        scores = outs[i].prompt_logprobs[1:]
        nll -= sum(scores)
        n += len(scores)
    return nll / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--len", type=int, dest="length", default=96)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.RandomState(args.seed)
    prompts = [rng.randint(1, cfg.vocab_size, args.length).tolist()
               for _ in range(args.seqs)]

    print(f"# {args.seqs} seqs x {args.length} tokens, chunk {args.chunk}, "
          f"echo scoring through the paged quantized pools")
    base = None
    for scheme in (KVDtype.BF16, KVDtype.INT8, KVDtype.FP8, KVDtype.INT4):
        nll = mean_nll(cfg, params, scheme, prompts, args.chunk)
        ppl = math.exp(nll)
        if base is None:
            base = ppl
        print(f"{scheme.value:5s}  nll/token {nll:.5f}  ppl {ppl:.2f}  "
              f"delta vs bf16 {100 * (ppl - base) / base:+.3f}%  "
              f"compression {COMPRESSION[scheme]:.0f}x")
    # weight-stream quantization (ops/wquant.py): same harness, isolating
    # the W8A16/W4A16 effect at the bf16 KV baseline and at the product
    # default (int8 KV) — the cross-term matters for the shipped config
    for wq, ratio in (("int8", "2x"), ("int4", "4x")):
        for scheme in (KVDtype.BF16, KVDtype.INT8):
            nll = mean_nll(cfg, params, scheme, prompts, args.chunk,
                           weight_dtype=wq)
            ppl = math.exp(nll)
            print(f"{scheme.value:5s}+W{wq[3]}A16  nll/token {nll:.5f}  "
                  f"ppl {ppl:.2f}  "
                  f"delta vs bf16 {100 * (ppl - base) / base:+.3f}%  "
                  f"(weights {ratio} smaller)")


if __name__ == "__main__":
    main()
