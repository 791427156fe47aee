"""Token sampling: greedy / temperature / top-k, batched and jitted."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("top_k",))
def sample_tokens(
    logits: jax.Array,        # [B, V] float32
    temperatures: jax.Array,  # [B] float32; <= 0 means greedy
    key: jax.Array,
    top_k: int = 0,
) -> jax.Array:
    """Returns sampled token ids [B]."""
    greedy = jnp.argmax(logits, axis=-1)
    t = jnp.maximum(temperatures, 1e-6)[:, None]
    scaled = logits / t
    if top_k > 0:
        kth = jax.lax.top_k(scaled, top_k)[0][:, -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    sampled = jax.random.categorical(key, scaled, axis=-1)
    return jnp.where(temperatures <= 0.0, greedy, sampled)
