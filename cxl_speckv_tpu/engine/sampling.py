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


# --------------------------------------------------------------------------
# sampling penalties (OpenAI frequency/presence + HF/vLLM repetition)
#
# Per-request token statistics live in a small device-resident plane
# `pen_counts` int32 [pen_rows + 1, vocab] (last row = guard for unpenalized
# lanes), keyed by a stable per-request row allocated by the engine. Each
# cell packs two facts:
#   bits 0..23  — how many times the token was SAMPLED this request
#                 (frequency/presence penalties, OpenAI output-only
#                 semantics)
#   bit 24      — the token appeared in this request's PREFILLED prompt
#                 (repetition penalty spans prompt + output, vLLM semantics)
# Counts update in-graph (scatter-add at sample time, scatter-max at prefill
# append time), so fused multi-token decode pays no host round trip. The
# reference exposes no sampling layer at all (its serving side is vLLM);
# this closes the OpenAI-parity row that round 2 de-scoped.
#
# Per-lane metadata rides `pen_info` int32 [B, 5]:
#   col 0 = pen_counts row (guard row for unpenalized lanes)
#   col 1 = frequency_penalty * 1000    (signed)
#   col 2 = presence_penalty  * 1000    (signed)
#   col 3 = repetition_penalty * 100    (0 = off)
#   col 4 = flags: bit 0 = reset the row before use (first prefill chunk of
#           a request — covers fresh slots, session turns, and preemption
#           restarts), bit 1 = count this dispatch's sampled token (set on
#           the prompt-completing prefill chunk only; intermediate chunks'
#           sampled tokens are discarded host-side and must not count)
# --------------------------------------------------------------------------

PEN_PROMPT_BIT = 1 << 24
PEN_COUNT_MASK = PEN_PROMPT_BIT - 1


def encode_pen_info(row: int, frequency_penalty: float = 0.0,
                    presence_penalty: float = 0.0,
                    repetition_penalty: float = 0.0,
                    reset: bool = False, count_sampled: bool = True) -> list:
    """Host-side: one pen_info row (see layout above). repetition_penalty
    <= 0 or == 1.0 encodes as 0 (off)."""
    rp = repetition_penalty if repetition_penalty > 0 else 0.0
    if abs(rp - 1.0) < 1e-9:
        rp = 0.0
    return [row, int(round(frequency_penalty * 1000)),
            int(round(presence_penalty * 1000)), int(round(rp * 100)),
            (1 if reset else 0) | (2 if count_sampled else 0)]


def apply_penalties(logits: jax.Array, rows: jax.Array, fp: jax.Array,
                    pp: jax.Array, rp: jax.Array) -> jax.Array:
    """logits [B, V] f32; rows = gathered pen_counts rows [B, V] int32;
    fp/pp/rp [B] f32 (rp == 0 means off). Lanes with fp == pp == 0 and
    rp off pass through bit-identically (x - 0.0 == x, `where` selects the
    untouched input), so mixed penalized/unpenalized batches share one
    program with no cross-lane contamination."""
    cnt = (rows & PEN_COUNT_MASK).astype(logits.dtype)
    out_seen = cnt > 0
    logits = (logits - fp[:, None] * cnt
              - pp[:, None] * out_seen.astype(logits.dtype))
    rp_on = (rp > 0.0)[:, None]
    seen = out_seen | (rows >= PEN_PROMPT_BIT)
    r = jnp.where(rp_on, jnp.maximum(rp[:, None], 1e-3), 1.0)
    shrunk = jnp.where(logits > 0, logits / r, logits * r)
    return jnp.where(seen & rp_on, shrunk, logits)


def penalize_and_count(logits: jax.Array, pen_info: jax.Array,
                       pen_counts: jax.Array, sample_fn):
    """Shared in-graph penalty step: gather each lane's stats row, penalize
    the logits, sample via `sample_fn(penalized_logits) -> tokens [B]`, then
    scatter-add the sampled tokens back (lanes with flag bit 1 clear — or
    pointing at the guard row — accumulate into the guard row, which is
    never read). Returns (tokens, updated pen_counts)."""
    guard = pen_counts.shape[0] - 1
    slots = pen_info[:, 0]
    fp = pen_info[:, 1].astype(jnp.float32) * 1e-3
    pp = pen_info[:, 2].astype(jnp.float32) * 1e-3
    rp = pen_info[:, 3].astype(jnp.float32) * 1e-2
    rows = pen_counts[slots]
    toks = sample_fn(apply_penalties(logits.astype(jnp.float32), rows,
                                     fp, pp, rp))
    count = (pen_info[:, 4] & 2) != 0
    dst = jnp.where(count, slots, guard)
    pen_counts = pen_counts.at[dst, toks].add(1, mode="drop")
    return toks, pen_counts


def pen_reset_rows(pen_info: jax.Array, pen_counts: jax.Array) -> jax.Array:
    """Zero the rows whose flag bit 0 is set (first prefill chunk of a
    request). Unflagged lanes redirect to the guard row (zeroing it is
    harmless — it is never read)."""
    guard = pen_counts.shape[0] - 1
    dst = jnp.where((pen_info[:, 4] & 1) != 0, pen_info[:, 0], guard)
    return pen_counts.at[dst].set(0, mode="drop")


def pen_mark_prompt(pen_info: jax.Array, pen_counts: jax.Array,
                    token_ids: jax.Array, valid: jax.Array) -> jax.Array:
    """Set the prompt-presence bit for this chunk's prompt tokens
    (token_ids [B, T]; positions >= valid[b] go to the guard row)."""
    guard = pen_counts.shape[0] - 1
    B, T = token_ids.shape
    rows = jnp.broadcast_to(pen_info[:, 0, None], (B, T))
    rows = jnp.where(jnp.arange(T)[None, :] < valid[:, None], rows, guard)
    return pen_counts.at[rows, token_ids].max(PEN_PROMPT_BIT, mode="drop")


@functools.partial(jax.jit, static_argnames=("top_k",),
                   donate_argnames=("pen_counts",))
def sample_tokens_penalized(
    logits: jax.Array,        # [B, V] float32
    temperatures: jax.Array,  # [B] f32
    key: jax.Array,
    pen_info: jax.Array,      # [B, 5] int32 (see module comment)
    pen_counts: jax.Array,    # [rows + 1, V] int32
    top_k: int = 0,
    top_ps: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """`sample_tokens` with the penalty step fused in (single-step decode
    path). Returns (tokens [B], updated pen_counts)."""
    return penalize_and_count(
        logits, pen_info, pen_counts,
        lambda lg: sample_tokens(lg, temperatures, key, top_k, top_ps))


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
