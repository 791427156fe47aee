"""Speculative decoding with a draft model + speculative KV.

The fifth BASELINE.json configuration: a small draft model proposes
`gamma` tokens autoregressively; the target model scores all gamma+1
positions in ONE `verify_step` over the paged quantized cache; the longest
agreeing prefix is accepted plus one corrected/bonus token (greedy
acceptance — emitted text is token-identical to plain greedy decoding, which
the tests assert exactly on CPU; on TPU MXU the verify path's chunked
attention and the decode kernel round differently at f32, so near-tie argmax
picks can differ — the output remains a self-consistent greedy decode of the
target model under the verify numerics, and agreement approaches 1 as logit
margins grow, i.e. on trained checkpoints).

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


@dataclass
class SpecStatistics(Statistics):
    rounds: int = 0
    drafted: int = 0
    accepted: int = 0
    bonus: int = 0

    @property
    def acceptance_rate(self) -> float:
        return ratio(self.accepted, self.drafted)

    def as_dict(self) -> dict:
        d = super().as_dict()
        d["acceptance_rate"] = self.acceptance_rate
        d["tokens_per_round"] = ratio(self.accepted + self.bonus, self.rounds)
        return d


class SpecDecoder:
    """Owns the draft model's cache and the propose/verify/accept cycle."""

    def __init__(self, draft_config: LlamaConfig, draft_params,
                 target_kvc, gamma: int = 4,
                 draft_kv_dtype: KVDtype = KVDtype.BF16,
                 use_pallas: bool = False):
        self.config = draft_config
        self.params = draft_params
        self.kvc = target_kvc
        self.gamma = gamma
        self.kv_dtype = draft_kv_dtype
        self.use_pallas = use_pallas

        cache = target_kvc.config
        c = draft_config
        self.block_size = cache.block_size
        n_slots = cache.total_blocks + 1  # all logical blocks fit; +1 guard
        pack = 2 if draft_kv_dtype == KVDtype.INT4 else 1
        kv_shape = (c.num_layers, n_slots, c.num_kv_heads, cache.block_size,
                    c.head_dim // pack)
        sc_shape = (c.num_layers, n_slots, c.num_kv_heads, cache.block_size)
        elem = kv_storage_dtype(draft_kv_dtype)
        self.pools = (jnp.zeros(kv_shape, elem), jnp.zeros(kv_shape, elem),
                      jnp.ones(sc_shape, jnp.float32), jnp.ones(sc_shape, jnp.float32))
        self.guard_slot = n_slots - 1
        self._free = list(range(n_slots - 2, -1, -1))
        self._slot_of_bid: dict[int, int] = {}
        mb = target_kvc.pool.table.max_blocks_per_seq
        self.table = np.full((target_kvc.pool.table.max_seqs, mb),
                             self.guard_slot, np.int32)
        self.stats = SpecStatistics()

    # -- bookkeeping ---------------------------------------------------------

    def sync_seq(self, seq_slot: int) -> None:
        """Assign draft slots for any newly-allocated logical blocks."""
        for i, bid in enumerate(self.kvc.pool.seq(seq_slot).blocks):
            if bid not in self._slot_of_bid:
                slot = self._free.pop()
                self._slot_of_bid[bid] = slot
                self.table[seq_slot, i] = slot

    def on_free_seq(self, seq_slot: int, bids: list[int]) -> None:
        for bid in bids:
            slot = self._slot_of_bid.pop(bid, None)
            if slot is not None:
                self._free.append(slot)
        self.table[seq_slot, :] = self.guard_slot

    # -- model steps ---------------------------------------------------------

    def prefill(self, seq_slot: int, tokens: jax.Array, start_pos: int,
                valid_len: int) -> None:
        self.sync_seq(seq_slot)
        _, *pools = prefill_chunk(
            self.params, self.config, self.kv_dtype, tokens,
            jnp.int32(start_pos), *self.pools,
            jnp.asarray(self.table[seq_slot]), jnp.int32(valid_len),
            use_pallas=self.use_pallas)
        self.pools = tuple(pools)

    def propose(self, last_tokens: np.ndarray, positions: np.ndarray,
                tables: np.ndarray, active: np.ndarray) -> np.ndarray:
        """Draft gamma tokens per lane in ONE fused device dispatch.

        last_tokens [B] (the last accepted token, KV not yet appended),
        positions [B] its position. Returns drafts [B, gamma].

        Uses the fused multi-token decode with horizon gamma+1: the feed
        chain (last, d_1, ..., d_gamma) is exactly the greedy draft chain,
        and the extra feed appends the last draft token's KV so the draft
        cache covers position n-1+gamma (on full acceptance the next round
        starts from there)."""
        from cxl_speckv_tpu.models.llama import decode_multi_packed

        B = last_tokens.shape[0]
        mb = tables.shape[1]
        packed = np.zeros((B, mb + 4), np.int32)
        packed[:, 0] = last_tokens
        packed[:, 1] = positions
        # cols 2 (temp) and 3 (rng counter) stay 0: greedy drafting
        packed[:, 4:] = tables
        toks, *pools = decode_multi_packed(
            self.params, self.config, self.kv_dtype, packed, *self.pools,
            horizon=self.gamma + 1)
        self.pools = tuple(pools)
        drafts = np.asarray(toks)[:, : self.gamma].astype(np.int32)
        self.stats.drafted += int(active.sum()) * self.gamma
        return drafts

    def accept_greedy(self, drafts: np.ndarray, target_logits: np.ndarray,
                      active: np.ndarray) -> tuple[list[list[int]], np.ndarray]:
        """Greedy acceptance. target_logits [B, gamma+1, V] from verify_step
        (row t is the verdict on drafts[:, t]; last row yields the bonus).
        Returns (emitted tokens per lane, accepted counts [B])."""
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
