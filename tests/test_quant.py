"""Quantization round-trip tests.

Model: the reference compress/decompress inverse pair
(`src/fpga_engine/cache_engine.cpp:40-116`, `decompress(compress(x)) ~= x`
within INT8 tolerance) plus compression-ratio accounting
(`cache_engine.cpp:25-33`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.ops.quant import (
    compressed_bytes_per_token,
    dequantize_kv,
    kv_storage_dtype,
    kv_storage_shape,
    quantization_rms_error,
    quantize_kv,
)

DTYPES = [KVDtype.BF16, KVDtype.INT8, KVDtype.INT4, KVDtype.FP8]
# relative RMS error budgets per format
TOL = {KVDtype.BF16: 5e-3, KVDtype.INT8: 8e-3, KVDtype.INT4: 0.12, KVDtype.FP8: 4e-2}


def sample(shape=(16, 8, 128), seed=0, scale=3.0):
    k = jax.random.PRNGKey(seed)
    # heavy-tailed, per-row varying magnitude — KV-like
    x = jax.random.normal(k, shape, jnp.float32)
    rowscale = 10.0 ** jax.random.uniform(jax.random.PRNGKey(seed + 1),
                                          (*shape[:-1], 1), minval=-2, maxval=1)
    return x * rowscale * scale


@pytest.mark.parametrize("dt", DTYPES)
def test_roundtrip_error(dt):
    x = sample()
    err = float(quantization_rms_error(x, dt))
    assert err < TOL[dt], f"{dt}: rel RMS {err}"


@pytest.mark.parametrize("dt", DTYPES)
def test_shapes_and_dtypes(dt):
    from cxl_speckv_tpu.ops.quant import decode_from_pool, encode_for_pool

    x = sample((4, 2, 64))
    q, s = quantize_kv(x, dt)
    # pool storage round-trips through the physical element type (FP8 bits
    # live in int8 bytes so schemes can share one pool)
    stored = encode_for_pool(q, dt)
    assert stored.dtype == kv_storage_dtype(dt)
    assert stored.shape == kv_storage_shape(x.shape, dt)
    assert s.shape == (4, 2, 1)
    np.testing.assert_array_equal(
        np.asarray(decode_from_pool(stored, dt)).view(np.uint8),
        np.asarray(q).view(np.uint8))
    y = dequantize_kv(q, s, dt)
    assert y.shape == x.shape
    # dequant from raw pool storage must agree with dequant of fresh values
    y2 = dequantize_kv(stored, s, dt)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_int4_packing_exact():
    # every representable int4 value must survive pack/unpack exactly
    vals = jnp.arange(-7, 8, dtype=jnp.float32)
    x = jnp.tile(vals, 2)[None, :]  # [1, 30]
    q, s = quantize_kv(x, KVDtype.INT4)
    assert q.shape == (1, 15)
    y = dequantize_kv(q, s, KVDtype.INT4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)


def test_scale_is_per_row():
    x = jnp.stack([jnp.ones(128), jnp.ones(128) * 1000.0])
    _, s = quantize_kv(x, KVDtype.INT8)
    assert float(s[1, 0]) / float(s[0, 0]) == pytest.approx(1000.0, rel=1e-5)


def test_compression_ratio_accounting():
    # 8 KV heads, head_dim 128: bf16 K+V = 4096 B/token/layer
    bf16 = compressed_bytes_per_token(8, 128, KVDtype.BF16)
    int8 = compressed_bytes_per_token(8, 128, KVDtype.INT8)
    int4 = compressed_bytes_per_token(8, 128, KVDtype.INT4)
    assert bf16 == 4096
    assert bf16 / int8 == pytest.approx(1.94, abs=0.05)   # ~2x minus sideband
    assert bf16 / int4 == pytest.approx(3.76, abs=0.05)   # ~4x minus sideband
    assert KVDtype.INT4.compression_ratio == 4.0
