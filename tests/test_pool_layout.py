"""kT pool-layout invariants (r3).

The transposed K layout lives in four places that must agree byte-for-byte:
the append scatter (`models.llama._kt_append`), the store<->pool migration
converters (`ops.paged_attention.store_to_kt/kt_to_store`), the test pool
builder (`tests/helpers.build_pools`), and the kernels' logical view
(`ops.paged_attention_ref._dequant_kt_blocks`). These property tests pin
the conversions against each other so a layout drift fails loudly instead
of as a numeric mystery.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.models.llama import _kt_append, _sc_append
from cxl_speckv_tpu.ops.paged_attention import kt_to_store, store_to_kt
from cxl_speckv_tpu.ops.paged_attention_ref import _dequant_kt_blocks
from cxl_speckv_tpu.ops.quant import (dequantize_kv, encode_for_pool,
                                      kv_storage_dtype, quantize_kv)

HKV, BS, D = 4, 8, 32


@pytest.mark.parametrize("dt", [KVDtype.INT8, KVDtype.INT4, KVDtype.BF16])
def test_store_kt_roundtrip(dt):
    rng = np.random.RandomState(0)
    pack = 2 if dt == KVDtype.INT4 else 1
    blk = rng.randint(-100, 100, (3, 2, HKV, BS, D // pack)).astype(
        np.dtype(kv_storage_dtype(dt)))
    kt = store_to_kt(jnp.asarray(blk))
    assert kt.shape == (3, 2, D // pack, HKV * BS)
    back = kt_to_store(kt, HKV)
    np.testing.assert_array_equal(np.asarray(back), blk)


@pytest.mark.parametrize("dt", [KVDtype.INT8, KVDtype.INT4])
def test_kt_append_matches_store_transpose(dt):
    """Appending token rows one-by-one must produce the same kT bytes as
    transposing a whole store-layout block."""
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.randn(BS, HKV, D).astype(np.float32))
    kq, ks = quantize_kv(k, dt)
    kenc = encode_for_pool(kq, dt)                      # [BS, Hkv, D/pack]
    pack = 2 if dt == KVDtype.INT4 else 1

    # whole-block conversion: [Hkv, BS, Dp] store layout -> kT
    store_blk = jnp.transpose(kenc, (1, 0, 2))          # [Hkv, BS, Dp]
    want = store_to_kt(store_blk)                       # [Dp, Hkv*BS]

    # token-by-token append into a 2-slot pool (slot 1 = guard)
    kt_pool = jnp.zeros((2, D // pack, HKV * BS), kenc.dtype)
    slots = jnp.zeros(BS, jnp.int32)
    offs = jnp.arange(BS, dtype=jnp.int32)
    got = _kt_append(kt_pool, kenc, slots, offs, BS)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # and the logical view recovers the dequantized values exactly
    logical = _dequant_kt_blocks(got[None], HKV, dt)[0]  # [Hkv, BS, D]
    deq = dequantize_kv(kq, ks, dt)                      # [BS, Hkv, D]
    np.testing.assert_allclose(
        np.asarray(logical) * 1.0,
        np.asarray(jnp.transpose(
            deq / ks, (1, 0, 2))),   # undo scale: raw values
        rtol=1e-6, atol=1e-6)


def test_sc_append_matches_flat_layout():
    rng = np.random.RandomState(2)
    vals = jnp.asarray(rng.rand(BS, HKV).astype(np.float32))
    sc_pool = jnp.zeros((2, 1, HKV * BS), jnp.float32)
    slots = jnp.zeros(BS, jnp.int32)
    offs = jnp.arange(BS, dtype=jnp.int32)
    got = _sc_append(sc_pool, vals, slots, offs, BS)[0, 0]
    # column h*BS + t must hold vals[t, h]
    want = np.asarray(vals).T.reshape(-1)
    np.testing.assert_array_equal(np.asarray(got), want)
