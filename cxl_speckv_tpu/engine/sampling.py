"""Token sampling: greedy / temperature / top-k / top-p (nucleus), batched
and jitted.

Per-lane sampling metadata rides ONE int32 column of the packed engine
arrays (`encode_sampling` / `decode_sampling`): temperature*1000 in the low
15 bits, top_p*1000 in bits 16..30. A plain `temp*1000` encoding (the
pre-top-p layout) decodes with top_p bits = 0, which means "off" — so the
packing is backward compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def encode_sampling(temperature: float, top_p: float = 1.0) -> int:
    """Host-side: pack (temperature, top_p) into one int32 metadata word."""
    t = max(0, min(int(round(temperature * 1000)), 0x7FFF))
    p = top_p if 0.0 < top_p < 1.0 else 0.0  # 0 or >= 1 -> nucleus off
    pm = max(0, min(int(round(p * 1000)), 1000))
    return t | (pm << 16)


def decode_sampling(col: jax.Array) -> tuple[jax.Array, jax.Array]:
    """In-graph: int32 metadata word(s) -> (temperatures, top_ps) f32."""
    temps = (col & 0x7FFF).astype(jnp.float32) * 1e-3
    top_ps = ((col >> 16) & 0x7FFF).astype(jnp.float32) * 1e-3
    return temps, top_ps


def nucleus_filter(probs: jax.Array, top_ps: jax.Array) -> jax.Array:
    """Zero out tokens outside the smallest set whose probability mass
    reaches top_p (ties at the threshold are kept), renormalized.
    probs [..., V], top_ps broadcastable to probs[..., 0]; lanes with
    top_p <= 0 or >= 1 pass through unchanged."""
    sp = jnp.flip(jnp.sort(probs, axis=-1), axis=-1)      # descending
    csum = jnp.cumsum(sp, axis=-1)
    first = jnp.argmax(csum >= top_ps[..., None], axis=-1)  # first idx covering
    thr = jnp.take_along_axis(sp, first[..., None], axis=-1)
    active = ((top_ps > 0.0) & (top_ps < 1.0))[..., None]
    filt = jnp.where(active & (probs < thr), 0.0, probs)
    return filt / jnp.maximum(filt.sum(-1, keepdims=True), 1e-20)


@functools.partial(jax.jit, static_argnames=("top_k",))
def sample_tokens(
    logits: jax.Array,        # [B, V] float32
    temperatures: jax.Array,  # [B] float32; <= 0 means greedy
    key: jax.Array,
    top_k: int = 0,
    top_ps: jax.Array | None = None,  # [B] f32; 0 or >= 1 means off
) -> jax.Array:
    """Returns sampled token ids [B]."""
    greedy = jnp.argmax(logits, axis=-1)
    t = jnp.maximum(temperatures, 1e-6)[:, None]
    scaled = logits / t
    if top_k > 0:
        kth = jax.lax.top_k(scaled, top_k)[0][:, -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if top_ps is not None:
        # the nucleus filter costs a full-vocab sort — a real fraction of a
        # decode step at 128k vocab. lax.cond keeps it out of the executed
        # path unless some lane actually samples with 0 < top_p < 1 (greedy
        # and plain-temperature serving pay nothing).
        def _filtered(s):
            probs = jax.nn.softmax(s, axis=-1)
            kept = nucleus_filter(probs, top_ps)
            return jnp.where(kept > 0.0, s, -jnp.inf)

        active = jnp.any((top_ps > 0.0) & (top_ps < 1.0)
                         & (temperatures > 0.0))
        scaled = jax.lax.cond(active, _filtered, lambda s: s, scaled)
    sampled = jax.random.categorical(key, scaled, axis=-1)
    return jnp.where(temperatures <= 0.0, greedy, sampled)
