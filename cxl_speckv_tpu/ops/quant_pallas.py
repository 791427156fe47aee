"""Pallas append-path KV quantization kernels.

The on-device analog of the FPGA compression pipeline's datapath
(`hardware/rtl/kv_compress.v`): where the RTL streams one D=128 row per cycle
through 20 pipeline stages, the TPU kernel processes a (TILE_R, D) tile per
grid step on the VPU — max-abs reduce, scale, quantize, and (for INT4) nibble
packing, all in VMEM. Scales are emitted as a float32 sideband, like the
RTL's scale sideband port (`kv_compress.v:173-192`).

These kernels matter on the append path during prefill (thousands of rows per
step); XLA's fused jnp fallback (`ops/quant.py`) is used on CPU and remains
numerically identical — tests assert exact equivalence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.ops.pallas_utils import cdiv, interpret_mode, round_up

_TILE_R = 256  # rows per grid step; rows are (token, head) pairs


def _int8_kernel(x_ref, q_ref, s_ref):
    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q_ref[:] = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    s_ref[:] = scale


def _int4_kernel(x_ref, q_ref, s_ref):
    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 7.0)
    q = jnp.clip(jnp.round(xf / scale), -7.0, 7.0).astype(jnp.int8)
    d2 = q.shape[-1] // 2
    lo = q[:, :d2] & 0x0F
    hi = q[:, d2:] & 0x0F
    q_ref[:] = (lo | (hi << 4)).astype(jnp.int8)
    s_ref[:] = scale


def _fp8_kernel(x_ref, q_ref, s_ref):
    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 448.0)
    q_ref[:] = (xf / scale).astype(jnp.float8_e4m3fn)
    s_ref[:] = scale


_KERNELS = {
    KVDtype.INT8: (_int8_kernel, jnp.int8, 1),
    KVDtype.INT4: (_int4_kernel, jnp.int8, 2),
    KVDtype.FP8: (_fp8_kernel, jnp.float8_e4m3fn, 1),
}


@functools.partial(jax.jit, static_argnames=("kv_dtype",))
def quantize_rows(x: jax.Array, kv_dtype: KVDtype) -> tuple[jax.Array, jax.Array]:
    """Quantize a [R, D] row batch -> ([R, D/pack] values, [R, 1] scales).

    Pads R up to the row tile internally; callers receive exactly R rows.
    """
    if kv_dtype == KVDtype.BF16:
        return x.astype(jnp.bfloat16), jnp.ones((x.shape[0], 1), jnp.float32)
    kernel, out_dtype, pack = _KERNELS[kv_dtype]
    rows, d = x.shape
    rp = round_up(max(rows, 8), _TILE_R) if rows > _TILE_R else round_up(max(rows, 8), 8)
    tile = min(_TILE_R, rp)
    if rp != rows:
        x = jnp.pad(x, ((0, rp - rows), (0, 0)))
    q, s = pl.pallas_call(
        kernel,
        grid=(cdiv(rp, tile),),
        in_specs=[pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((tile, d // pack), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rp, d // pack), out_dtype),
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        ),
        interpret=interpret_mode(),
    )(x)
    return q[:rows], s[:rows]
