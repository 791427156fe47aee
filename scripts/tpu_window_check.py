"""On-hardware check of sliding-window + softcap attention kernels
(Mistral / Gemma families).

Interpreter-mode tests pin the semantics on CPU; this validates the
Mosaic lowering on the real chip: Pallas decode / chunk kernels with a
BINDING window and/or a tanh score softcap vs the jnp references,
random data, int8/int4/bf16.
Run on TPU: python scripts/tpu_window_check.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cxl_speckv_tpu.config import KVDtype
    from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention
    from cxl_speckv_tpu.ops.chunk_attention_pallas import (
        paged_chunk_attention_pallas)
    from cxl_speckv_tpu.ops.paged_attention import paged_attention
    from cxl_speckv_tpu.ops.paged_attention_ref import paged_attention_ref
    from cxl_speckv_tpu.ops.quant import kv_storage_dtype, quantize_kv, encode_for_pool

    print(f"backend={jax.default_backend()}", flush=True)
    B, Hq, Hkv, D, bs = 4, 32, 8, 128, 16
    mb, window = 32, 200          # up to 512 ctx tokens, window binds hard
    T = 8                          # chunk length (TG = 32)
    rng = np.random.RandomState(0)
    lens = np.array([512, 301, 97, 480], np.int32)

    for kv_dtype in (KVDtype.INT8, KVDtype.INT4, KVDtype.BF16):
        pack = 2 if kv_dtype == KVDtype.INT4 else 1
        S = B * mb + 1
        # r3 layouts: kT K pool + flat kT-order scales
        k_pool = np.zeros((S, D // pack, Hkv * bs),
                          np.dtype(kv_storage_dtype(kv_dtype)))
        v_pool = np.zeros((S, Hkv, bs, D // pack),
                          np.dtype(kv_storage_dtype(kv_dtype)))
        k_scale = np.ones((S, 1, Hkv * bs), np.float32)
        v_scale = np.ones_like(k_scale)
        table = rng.permutation(S - 1).astype(np.int32)[: B * mb].reshape(B, mb)
        for b in range(B):
            kv = rng.randn(2, mb * bs, Hkv, D).astype(np.float32)
            kq, ks = quantize_kv(jnp.asarray(kv[0]), kv_dtype)
            vq, vs = quantize_kv(jnp.asarray(kv[1]), kv_dtype)
            kenc = np.asarray(encode_for_pool(kq, kv_dtype))
            venc = np.asarray(encode_for_pool(vq, kv_dtype))
            for i in range(mb):
                sl = slice(i * bs, (i + 1) * bs)
                kt = kenc[sl].transpose(2, 1, 0)   # [Dp, Hkv, bs]
                k_pool[table[b, i]] = kt.reshape(kt.shape[0], -1)
                v_pool[table[b, i]] = venc[sl].transpose(1, 0, 2)
                k_scale[table[b, i], 0] = np.asarray(ks[sl, :, 0]).T.reshape(-1)
                v_scale[table[b, i], 0] = np.asarray(vs[sl, :, 0]).T.reshape(-1)
        args = (jnp.asarray(k_pool), jnp.asarray(v_pool),
                jnp.asarray(k_scale), jnp.asarray(v_scale),
                jnp.asarray(table), jnp.asarray(lens))

        q = jnp.asarray(rng.randn(B, Hq, D).astype(np.float32))
        qc = jnp.asarray(rng.randn(B, T, Hq, D).astype(np.float32))
        kn = jnp.asarray(rng.randn(B, T, Hkv, D).astype(np.float32))
        vn = jnp.asarray(rng.randn(B, T, Hkv, D).astype(np.float32))
        start = jnp.asarray(lens)

        for win, cap in ((window, None), (window, 30.0), (None, 30.0)):
            tag = f"win={win} cap={cap}"
            want = np.asarray(paged_attention_ref(
                q, *args, kv_dtype, window=win, softcap=cap))
            got = np.asarray(paged_attention(
                q, *args, kv_dtype, window=win, softcap=cap,
                compute_dtype=jnp.bfloat16))
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            print(f"decode {kv_dtype.value} {tag}: rel_err={err:.2e}",
                  flush=True)
            assert err < 2e-2, f"decode mismatch ({kv_dtype}, {tag})"

            want = np.asarray(paged_chunk_attention(
                qc, kn, vn, *args[:5], start, kv_dtype, window=win,
                softcap=cap))
            got = np.asarray(paged_chunk_attention_pallas(
                qc, kn, vn, *args[:5], start, kv_dtype, window=win,
                softcap=cap, compute_dtype=jnp.bfloat16))
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            print(f"chunk  {kv_dtype.value} {tag}: rel_err={err:.2e}",
                  flush=True)
            assert err < 2e-2, f"chunk mismatch ({kv_dtype}, {tag})"
    print("window/softcap kernels OK on hardware", flush=True)


if __name__ == "__main__":
    main()
