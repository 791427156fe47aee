"""Speculative decoding with a draft model + speculative KV.

The fifth BASELINE.json configuration: a small draft model proposes
`gamma` tokens autoregressively; the target model scores all gamma+1
positions in ONE `verify_step` over the paged quantized cache; acceptance
runs IN-GRAPH (`_accept_program` — the host fetches two [B] int vectors,
never the [B, gamma+1, vocab] logits):

- temperature-0 lanes: greedy token-match — emitted text is
  token-identical to plain greedy decoding, which the tests assert exactly
  on CPU (round 2 unified the decode/verify attention kernels, so this
  holds on TPU too — `scripts/tpu_spec_check.py`);
- sampled lanes: the speculative-sampling rule — accept draft t_j with
  probability min(1, p(t_j)/q(t_j)), on rejection resample from the
  normalized residual max(p-q, 0), bonus-sample from the target on full
  acceptance. The emitted distribution equals plain target sampling.

Speculative KV discipline (the engine-level analog of the reference's
lazy-invalidation misprediction handling, `speculative_prefetcher.cpp:
84-97`): both models append KV for every *proposed* position during
scoring; rejected positions are simply never covered by the advancing
sequence length and are overwritten by the next round — no rollback
machinery exists or is needed.

Draft KV lives in its own always-HBM-resident pool sized for the *full*
logical block space (`cache.total_blocks`): the draft cache is ~an order of
magnitude smaller than the target's, so it never tiers; tiering moves only
target KV. Draft slots are allocated per logical block and freed with the
sequence.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.core.stats import Statistics, ratio
from cxl_speckv_tpu.models.configs import LlamaConfig
from cxl_speckv_tpu.models.llama import prefill_chunk, verify_step
from cxl_speckv_tpu.ops.quant import kv_storage_dtype


import functools


def _accept_core(target_logits, draft_logits, drafts, temps, top_ps, key,
                 *, gamma: int):
    """Per-lane acceptance on device. target_logits [B, gamma+1, V] (row j
    scores drafts[:, j]; last row is the bonus position), draft_logits
    [B, gamma, V] (the proposal distributions the drafts were sampled
    from), drafts [B, gamma] int32, temps [B] f32 (<= 0 greedy).
    Returns (n_acc [B] int32, final_token [B] int32) — emitted tokens are
    drafts[:n_acc] + [final_token]. Undecorated trace body shared by the
    standalone `_accept_program` and the fused `_verify_accept_program`.

    `draft_logits=None` means the proposals are DETERMINISTIC (n-gram /
    lookup drafts): q is the one-hot at drafts, so q(t_j) = 1 (accept with
    probability p(t_j)) and the rejection residual is p with index t_j
    zeroed — the one-hot-q law computed WITHOUT materializing a
    [B, gamma, V] proposal tensor (16 MB at 128k vocab) or its builder
    dispatch."""
    from cxl_speckv_tpu.engine.sampling import nucleus_filter

    eps = 1e-20
    onehot_q = draft_logits is None
    preds = jnp.argmax(target_logits, axis=-1)            # [B, g+1]
    greedy_acc = preds[:, :gamma] == drafts               # [B, g]
    t = jnp.maximum(temps, 1e-6)[:, None, None]
    p = jax.nn.softmax(target_logits[:, :gamma] / t, axis=-1)  # [B, g, V]
    q = None if onehot_q else jax.nn.softmax(draft_logits / t, axis=-1)
    # top-p lanes: the speculative-sampling rule runs on the NUCLEUS-FILTERED
    # p and q (the draft was sampled from filtered q in-graph), preserving
    # the exactness guarantee w.r.t. plain top-p target sampling. The filter
    # costs full-vocab sorts — lax.cond keeps them out of the executed path
    # unless some lane actually uses top-p. (A one-hot q is a fixed point of
    # the filter, so the deterministic-proposal path filters p alone.)
    nucleus_active = jnp.any((top_ps > 0.0) & (top_ps < 1.0)
                             & (temps > 0.0))
    if onehot_q:
        p = jax.lax.cond(
            nucleus_active,
            lambda pp: nucleus_filter(pp, top_ps[:, None]),
            lambda pp: pp, p)
    else:
        p, q = jax.lax.cond(
            nucleus_active,
            lambda pq: (nucleus_filter(pq[0], top_ps[:, None]),
                        nucleus_filter(pq[1], top_ps[:, None])),
            lambda pq: pq, (p, q))
    pt = jnp.take_along_axis(p, drafts[..., None], axis=-1)[..., 0]  # [B, g]
    qt = (jnp.ones_like(pt) if onehot_q else
          jnp.take_along_axis(q, drafts[..., None], axis=-1)[..., 0])
    k_u, k_r = jax.random.split(key)
    u = jax.random.uniform(k_u, drafts.shape)
    samp_acc = u * qt <= pt          # accept iff u <= p(t)/q(t); q(t) > 0
    acc = jnp.where(temps[:, None] <= 0.0, greedy_acc, samp_acc)
    run = jnp.cumprod(acc.astype(jnp.int32), axis=1)      # leading accepts
    n_acc = run.sum(axis=1)                               # [B]
    all_acc = n_acc >= gamma
    idx = jnp.minimum(n_acc, gamma - 1)
    p_at = jnp.take_along_axis(p, idx[:, None, None], axis=1)[:, 0]  # [B, V]
    if onehot_q:
        t_at = jnp.take_along_axis(drafts, idx[:, None], axis=1)     # [B, 1]
        q_at = jax.nn.one_hot(t_at[:, 0], p.shape[-1], dtype=p.dtype)
    else:
        q_at = jnp.take_along_axis(q, idx[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(p_at - q_at, 0.0)
    rs = resid.sum(-1, keepdims=True)
    # residual can vanish only if p == q at that position; fall back to p
    resid = jnp.where(rs > eps, resid / jnp.maximum(rs, eps), p_at)
    bonus = jax.nn.softmax(
        target_logits[:, gamma] / jnp.maximum(temps, 1e-6)[:, None], axis=-1)
    bonus = jax.lax.cond(nucleus_active,
                         lambda b: nucleus_filter(b, top_ps),
                         lambda b: b, bonus)
    dist = jnp.where(all_acc[:, None], bonus, resid)
    sampled_final = jax.random.categorical(k_r, jnp.log(dist + eps), axis=-1)
    greedy_final = jnp.take_along_axis(
        preds, jnp.minimum(n_acc, gamma)[:, None], axis=1)[:, 0]
    final = jnp.where(temps <= 0.0, greedy_final, sampled_final)
    return n_acc.astype(jnp.int32), final.astype(jnp.int32)


_accept_program = functools.partial(
    jax.jit, static_argnames=("gamma",))(_accept_core)


@functools.partial(
    jax.jit,
    static_argnames=("config", "kv_dtype", "gamma", "use_pallas", "mesh",
                     "logprobs_k"),
    donate_argnames=("k_pools", "v_pools", "k_scales", "v_scales"),
)
def _verify_accept_program(params, config, kv_dtype, token_ids, start_pos,
                           k_pools, v_pools, k_scales, v_scales,
                           block_tables, active, draft_logits, drafts,
                           temps, top_ps, key, *, gamma: int,
                           use_pallas: bool = False, mesh=None,
                           logprobs_k: int = 0):
    """Verify + accept fused into ONE program (r5): the target scores all
    gamma+1 positions and the acceptance rule runs on the logits where they
    were produced — the host fetches two [B] int vectors and never pays a
    second dispatch. On this runtime's remote tunnel each dispatch costs
    ~25 ms (NOTES_ROUND4 round_anatomy), so at one spec round per tick the
    fusion removes a third of the round's fixed cost (draft arm) or half
    (n-gram arm, whose proposal is host-side and free).

    With `logprobs_k`, the emitted-token logprob rows (accepted drafts,
    then the correction/bonus at row n_acc) and top-k tables come back too
    — built in-graph from n_acc/final, the same construction the engine
    previously did on host from fetched vectors."""
    from cxl_speckv_tpu.models.llama import token_logprobs, verify_impl

    logits, *pools = verify_impl(
        params, config, kv_dtype, token_ids, start_pos,
        k_pools, v_pools, k_scales, v_scales, block_tables, active,
        use_pallas=use_pallas, mesh=mesh)
    n_acc, final = _accept_core(logits, draft_logits, drafts, temps,
                                top_ps, key, gamma=gamma)
    # one [2, B] array = ONE host fetch for the round's whole verdict
    out = (jnp.stack([n_acc, final]), *pools)
    if logprobs_k:
        B = drafts.shape[0]
        j = jnp.arange(gamma + 1)[None, :]
        drafts_p = jnp.concatenate(
            [drafts, jnp.zeros((B, 1), jnp.int32)], axis=1)
        tok_mat = jnp.where(j == n_acc[:, None], final[:, None], drafts_p)
        tok_mat = jnp.where(j > n_acc[:, None], 0, tok_mat)
        out += tuple(token_logprobs(logits, tok_mat, k=logprobs_k))
    return out


@dataclass
class SpecStatistics(Statistics):
    rounds: int = 0
    drafted: int = 0
    accepted: int = 0
    bonus: int = 0
    fallback_seeded: int = 0   # lookup misses seeded by the LSTM predictor

    @property
    def acceptance_rate(self) -> float:
        return ratio(self.accepted, self.drafted)

    def as_dict(self) -> dict:
        d = super().as_dict()
        d["acceptance_rate"] = self.acceptance_rate
        d["tokens_per_round"] = ratio(self.accepted + self.bonus, self.rounds)
        return d


class _AcceptanceMixin:
    """Verify/accept machinery shared by every proposal source (draft
    model or n-gram lookup). Subclasses provide `gamma`, `stats`, and set
    `self._draft_logits` ([B, gamma, V] device array: the distributions the
    drafts were proposed from) during `propose`."""

    # the TARGET engine's mesh (accept fetches the target's verify outputs;
    # distinct from a draft's own mesh, which may be downgraded to None for
    # head-incompatible drafts while the target still serves a global mesh)
    fetch_mesh = None

    def _fetch(self, arr) -> np.ndarray:
        """Multiprocess-safe host fetch (see parallel.sharding.host_fetch).
        The verify/accept outputs may span non-addressable devices when the
        target engine runs a multi-process global mesh."""
        if self.fetch_mesh is None:
            return np.asarray(arr)
        from cxl_speckv_tpu.parallel.sharding import host_fetch
        return host_fetch(arr, self.fetch_mesh)

    def accept(self, drafts: np.ndarray, target_logits,
               active: np.ndarray, temps: np.ndarray,
               key: np.ndarray,
               top_ps: np.ndarray | None = None) -> tuple[list[list[int]], np.ndarray]:
        """Acceptance, in-graph: greedy token-match for temperature-0 lanes,
        the speculative-sampling rule (accept draft t_j with probability
        min(1, p(t_j)/q(t_j)); on rejection resample from the normalized
        residual max(p - q, 0); bonus from the target on full acceptance —
        the output distribution equals plain target sampling) for the rest.

        target_logits [B, gamma+1, V] stays ON DEVICE (fetching it to the
        host costs ~10MB per round at 128k vocab — the acceptance fetch is
        two [B] int vectors). Returns (emitted tokens per lane, accepted
        counts [B])."""
        if top_ps is None:
            top_ps = np.zeros_like(np.asarray(temps, np.float32))
        n_acc_d, final_d = _accept_program(
            target_logits, self._draft_logits, jnp.asarray(drafts),
            jnp.asarray(np.asarray(temps, np.float32)),
            jnp.asarray(np.asarray(top_ps, np.float32)), jnp.asarray(key),
            gamma=self.gamma)
        n_acc = self._fetch(n_acc_d)
        final = self._fetch(final_d)
        emitted: list[list[int]] = []
        for b in range(drafts.shape[0]):
            if not active[b]:
                emitted.append([])
                continue
            j = int(n_acc[b])
            emitted.append([int(x) for x in drafts[b, :j]] + [int(final[b])])
            self.stats.accepted += j
            self.stats.bonus += 1
        self.stats.rounds += 1
        return emitted, n_acc

    def verify_accept(self, params, config, kv_dtype, verify_tokens,
                      positions, pools, block_tables, active, drafts,
                      temps, key, *, top_ps=None, use_pallas=False,
                      mesh=None, logprobs_k=0):
        """One-dispatch spec round tail: target verify + in-graph acceptance
        (`_verify_accept_program`). Same semantics and statistics as the
        verify_step + `accept` pair, minus one dispatch. Returns
        (emitted tokens per lane, n_acc [B], updated pools, logprob arrays
        or None)."""
        if top_ps is None:
            top_ps = np.zeros_like(np.asarray(temps, np.float32))
        verdict_d, *rest = _verify_accept_program(
            params, config, kv_dtype, verify_tokens, positions, *pools,
            block_tables, active, self._draft_logits, jnp.asarray(drafts),
            jnp.asarray(np.asarray(temps, np.float32)),
            jnp.asarray(np.asarray(top_ps, np.float32)), jnp.asarray(key),
            gamma=self.gamma, use_pallas=use_pallas, mesh=mesh,
            logprobs_k=logprobs_k)
        new_pools = tuple(rest[:4])
        lp_arrs = (tuple(self._fetch(a) for a in rest[4:7])
                   if logprobs_k else None)
        n_acc, final = self._fetch(verdict_d)
        emitted: list[list[int]] = []
        for b in range(drafts.shape[0]):
            if not active[b]:
                emitted.append([])
                continue
            j = int(n_acc[b])
            emitted.append([int(x) for x in drafts[b, :j]] + [int(final[b])])
            self.stats.accepted += j
            self.stats.bonus += 1
        self.stats.rounds += 1
        return emitted, n_acc, new_pools, lp_arrs

    def accept_greedy(self, drafts: np.ndarray, target_logits: np.ndarray,
                      active: np.ndarray) -> tuple[list[list[int]], np.ndarray]:
        """Greedy acceptance on host logits (kept for tests/tools; the
        engine path is `accept`)."""
        B, T, _ = target_logits.shape
        target_pred = target_logits.argmax(-1)  # [B, T]
        emitted: list[list[int]] = []
        n_acc = np.zeros(B, np.int32)
        for b in range(B):
            if not active[b]:
                emitted.append([])
                continue
            out = []
            j = 0
            while j < self.gamma and target_pred[b, j] == drafts[b, j]:
                out.append(int(drafts[b, j]))
                j += 1
            # correction (on mismatch) or bonus (all accepted) token
            out.append(int(target_pred[b, j]))
            n_acc[b] = j
            self.stats.accepted += j
            self.stats.bonus += 1
            emitted.append(out)
        self.stats.rounds += 1
        return emitted, n_acc

    def get_statistics(self) -> SpecStatistics:
        return self.stats

    def reset_statistics(self) -> None:
        self.stats.reset()


class SpecDecoder(_AcceptanceMixin):
    """Owns the draft model's cache and the propose/verify/accept cycle."""

    has_draft_model = True

    def __init__(self, draft_config: LlamaConfig, draft_params,
                 target_kvc, gamma: int = 4,
                 draft_kv_dtype: KVDtype = KVDtype.BF16,
                 use_pallas: bool = False, mesh=None):
        self.config = draft_config
        self.params = draft_params
        self.kvc = target_kvc
        self.gamma = gamma
        self.kv_dtype = draft_kv_dtype
        # the shard-mapped kernel decomposition needs the draft's kv heads
        # to divide tp too; a head-incompatible draft falls back to the
        # GSPMD-partitionable reference attention (target kernels unaffected)
        self.fetch_mesh = mesh
        self.mesh = mesh
        if mesh is not None and (
                draft_config.num_kv_heads % mesh.shape["tp"]
                or draft_config.num_q_heads % mesh.shape["tp"]):
            self.mesh = None
            use_pallas = False
        self.use_pallas = use_pallas

        cache = target_kvc.config
        c = draft_config
        self.block_size = cache.block_size
        n_slots = cache.total_blocks + 1  # all logical blocks fit; +1 guard
        pack = 2 if draft_kv_dtype == KVDtype.INT4 else 1
        kt_shape = (c.num_layers, n_slots, c.head_dim // pack,
                    c.num_kv_heads * cache.block_size)
        kv_shape = (c.num_layers, n_slots, c.num_kv_heads, cache.block_size,
                    c.head_dim // pack)
        sc_shape = (c.num_layers, n_slots, 1,
                    c.num_kv_heads * cache.block_size)
        elem = kv_storage_dtype(draft_kv_dtype)
        self.pools = (jnp.zeros(kt_shape, elem), jnp.zeros(kv_shape, elem),
                      jnp.ones(sc_shape, jnp.float32), jnp.ones(sc_shape, jnp.float32))
        if self.mesh is not None:
            # draft KV heads shard over tp like the target pools (the draft
            # model's params are sharded by the engine; its pools must match)
            from cxl_speckv_tpu.parallel.sharding import pool_put
            put = pool_put(self.mesh)
            self.pools = tuple(put(p, role) for p, role
                               in zip(self.pools, ("kt", "v", "sc", "sc")))
        self.guard_slot = n_slots - 1
        self._free = list(range(n_slots - 2, -1, -1))
        self._slot_of_bid: dict[int, int] = {}
        mb = target_kvc.pool.table.max_blocks_per_seq
        self.table = np.full((target_kvc.pool.table.max_seqs, mb),
                             self.guard_slot, np.int32)
        self.stats = SpecStatistics()

    # -- bookkeeping ---------------------------------------------------------

    def sync_seq(self, seq_slot: int) -> None:
        """Assign draft slots for any newly-allocated logical blocks. A
        prefix-shared bid already has a slot (holding draft KV written by
        the original prefill — bit-valid for the claimer too: same tokens,
        same absolute positions); the claimer's table row maps to it."""
        for i, bid in enumerate(self.kvc.pool.seq(seq_slot).blocks):
            if bid is None:
                continue
            slot = self._slot_of_bid.get(bid)
            if slot is None:
                slot = self._free.pop()
                self._slot_of_bid[bid] = slot
            self.table[seq_slot, i] = slot

    def on_free_seq(self, seq_slot: int, bids: list[int]) -> None:
        """Called AFTER the target pool freed the sequence, so
        `pool.is_live(bid)` is true exactly when a prefix-shared block
        survives in another holder — its draft slot must stay."""
        for bid in bids:
            if self.kvc.pool.is_live(bid):
                continue
            slot = self._slot_of_bid.pop(bid, None)
            if slot is not None:
                self._free.append(slot)
        self.table[seq_slot, :] = self.guard_slot

    def retire_blocks(self, seq_slot: int, freed: list[tuple[int, int]]) -> None:
        """Release draft-cache slots for target blocks a sliding window
        retired (partial `on_free_seq`: only the named table entries reset,
        the sequence stays live)."""
        for i, bid in freed:
            if not self.kvc.pool.is_live(bid):
                slot = self._slot_of_bid.pop(bid, None)
                if slot is not None:
                    self._free.append(slot)
            self.table[seq_slot, i] = self.guard_slot

    # -- model steps ---------------------------------------------------------

    def prefill(self, seq_slot: int, tokens: jax.Array, start_pos: int,
                valid_len: int) -> None:
        self.sync_seq(seq_slot)
        _, *pools = prefill_chunk(
            self.params, self.config, self.kv_dtype, tokens,
            jnp.int32(start_pos), *self.pools,
            jnp.asarray(self.table[seq_slot]), jnp.int32(valid_len),
            use_pallas=self.use_pallas, mesh=self.mesh)
        self.pools = tuple(pools)

    def prefill_batch(self, lanes, *, chunk: int, batch: int) -> None:
        """Mirror a prefill wave into the draft cache in ONE dispatch
        (the engine's batched target prefill shape — same program family).
        lanes: [(seq_slot, start, n, tokens)] with len(tokens) == n."""
        from cxl_speckv_tpu.models.llama import prefill_batch_packed

        if not lanes:
            return
        mb = self.table.shape[1]
        packed = np.zeros((batch, 4 + mb + chunk), np.int32)
        packed[:, 4:4 + mb] = self.guard_slot
        for i, (seq_slot, start, n, tokens) in enumerate(lanes):
            self.sync_seq(seq_slot)
            packed[i, 0] = start
            packed[i, 1] = n
            packed[i, 4:4 + mb] = self.table[seq_slot]
            packed[i, 4 + mb:4 + mb + n] = tokens
        _, *pools = prefill_batch_packed(
            self.params, self.config, self.kv_dtype, packed, *self.pools,
            max_blocks=mb, rng_seed=0, use_pallas=self.use_pallas,
            mesh=self.mesh)
        self.pools = tuple(pools)

    def propose(self, last_tokens: np.ndarray, positions: np.ndarray,
                tables: np.ndarray, active: np.ndarray,
                temps: np.ndarray | None = None,
                top_ps: np.ndarray | None = None,
                rng_counter: int = 0) -> np.ndarray:
        """Draft gamma tokens per lane in ONE fused device dispatch.

        last_tokens [B] (the last accepted token, KV not yet appended),
        positions [B] its position. Returns drafts [B, gamma]; the draft
        chain's per-step logits stay on device (`self._draft_logits`) for
        the speculative-sampling acceptance rule.

        Uses the fused multi-token decode with horizon gamma+1: the feed
        chain (last, d_1, ..., d_gamma) is exactly the draft chain (greedy
        for temperature-0 lanes, sampled otherwise), and the extra feed
        appends the last draft token's KV so the draft cache covers position
        n-1+gamma (on full acceptance the next round starts from there)."""
        from cxl_speckv_tpu.models.llama import decode_multi_packed

        B = last_tokens.shape[0]
        mb = tables.shape[1]
        packed = np.zeros((B, mb + 4), np.int32)
        packed[:, 0] = last_tokens
        packed[:, 1] = positions
        if temps is not None:
            from cxl_speckv_tpu.engine.sampling import encode_sampling
            tp = np.ones_like(temps) if top_ps is None else np.asarray(top_ps)
            packed[:, 2] = [encode_sampling(float(t), float(pp))
                            for t, pp in zip(temps, tp)]
        packed[:, 3] = rng_counter
        packed[:, 4:] = tables
        toks, *rest = decode_multi_packed(
            self.params, self.config, self.kv_dtype, packed, *self.pools,
            horizon=self.gamma + 1, return_logits=True,
            use_pallas=self.use_pallas, mesh=self.mesh)
        self.pools = tuple(rest[:4])
        self._draft_logits = rest[4][:, : self.gamma]  # [B, g, V] device
        drafts = self._fetch(toks)[:, : self.gamma].astype(np.int32)
        self.stats.drafted += int(active.sum()) * self.gamma
        return drafts


class NgramProposer(_AcceptanceMixin):
    """Draft-model-free speculation: prompt-lookup (n-gram) proposals.

    Searches the lane's own token history (prompt + generated output) for
    the most recent earlier occurrence of the current `max_match`-token
    suffix (falling back to shorter suffixes down to `min_match`) and
    proposes the `gamma` tokens that followed it — strong on extractive /
    repetitive continuations (summarization, code edits, retrieval-heavy
    prompts), and harmless when wrong: the target's verify pass costs the
    same either way, greedy lanes stay token-identical to plain decoding,
    and sampled lanes keep the exact target-sampling law: with a one-hot
    proposal q, q(t_j) = 1 so the rule accepts with probability p(t_j) and
    the rejection residual max(p - onehot, 0) renormalizes to p excluding
    t_j — P[t_j] = p(t_j), P[s != t_j] = (1 - p(t_j)) * p(s)/(1 - p(t_j)),
    exactly plain target sampling (`_accept_core`, draft_logits=None).

    The engine-facing surface mirrors `SpecDecoder` (same propose/verify/
    accept cycle against the target's `verify_step`) but there is NO draft
    model and NO draft KV cache: bookkeeping hooks are vacuous and `table`
    is an all-zeros placeholder the tick packs without reading. Analogous
    in spirit to the reference's history-driven speculation
    (`speculative_prefetcher.cpp:25-82`) — here the history IS the model.
    """

    has_draft_model = False

    def __init__(self, target_kvc, vocab_size: int, gamma: int = 4,
                 max_match: int = 3, min_match: int = 1):
        if max_match < min_match or min_match < 1:
            raise ValueError("need max_match >= min_match >= 1")
        self.gamma = gamma
        self.vocab = vocab_size
        self.max_match = max_match
        self.min_match = min_match
        self.guard_slot = 0
        tab = target_kvc.pool.table
        self.table = np.zeros((tab.max_seqs, tab.max_blocks_per_seq),
                              np.int32)
        self.stats = SpecStatistics()
        self._draft_logits = None

    # no draft cache: bookkeeping hooks are vacuous
    def sync_seq(self, seq_slot: int) -> None:
        pass

    def on_free_seq(self, seq_slot: int, bids: list[int]) -> None:
        pass

    def retire_blocks(self, seq_slot: int, freed: list[tuple[int, int]]) -> None:
        pass

    def prefill(self, *args, **kwargs) -> None:
        pass

    def prefill_batch(self, *args, **kwargs) -> None:
        pass

    def lookup(self, hist: list[int]) -> list[int]:
        """Longest-suffix prompt lookup: the continuation (<= gamma tokens)
        of the most recent earlier occurrence of the history's suffix, or
        [] when no suffix of length in [min_match, max_match] recurs."""
        n = len(hist)
        if n < self.min_match + 1:
            return []
        arr = np.asarray(hist, np.int32)
        for m in range(min(self.max_match, n - 1), self.min_match - 1, -1):
            suffix = arr[n - m:]
            num = n - m  # candidate windows [0, n-m); the suffix itself excluded
            idx = np.arange(num)[:, None] + np.arange(m)[None, :]
            starts = np.nonzero((arr[idx] == suffix).all(axis=1))[0]
            if starts.size == 0:
                continue
            s = int(starts[-1])  # most recent occurrence wins
            cont = arr[s + m: s + m + self.gamma]
            return cont.tolist()
        return []

    def propose(self, last_tokens: np.ndarray, positions: np.ndarray,
                tables: np.ndarray, active: np.ndarray,
                temps: np.ndarray | None = None,
                top_ps: np.ndarray | None = None,
                rng_counter: int = 0,
                histories: list[list[int]] | None = None,
                fallback=None) -> np.ndarray:
        """Pure host-side proposal (no device dispatch). Lanes whose lookup
        misses draft a repeat of their last token — the verify pass costs
        the same and the mismatch correction still emits one true token.

        `fallback(miss_lanes) -> [len(miss)] int32` (optional) supplies a
        better miss draft — the engine wires the LSTM prefetch predictor's
        top-k here, so the predictor's token predictions do serving work
        beyond the EOS gate (r2 verdict weak #8). Negative entries keep the
        repeat-last default; proposals are heuristic, never correctness."""
        B = last_tokens.shape[0]
        drafts = np.tile(np.asarray(last_tokens, np.int32)[:, None],
                         (1, self.gamma))
        miss = []
        for i in range(B):
            if not active[i] or histories is None or i >= len(histories):
                continue
            got = self.lookup(histories[i])
            if got:
                drafts[i, : len(got)] = got
            else:
                miss.append(i)
        if miss and fallback is not None:
            fb = np.asarray(fallback(miss), np.int32)
            for j, i in enumerate(miss):
                if 0 <= fb[j] < self.vocab:
                    drafts[i, :] = fb[j]
                    self.stats.fallback_seeded += 1
        # deterministic proposals: q is the one-hot at drafts. Acceptance
        # (fused or standalone) computes that law in-graph from `drafts`
        # alone (draft_logits=None, `_accept_core`) — no [B, gamma, V]
        # proposal tensor (16 MB at 128k vocab) and no builder dispatch.
        self._draft_logits = None
        self.stats.drafted += int(np.asarray(active).sum()) * self.gamma
        return drafts
