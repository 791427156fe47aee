"""Logical -> physical block table.

TPU-native replacement for the reference address-translation machinery: the
direct-mapped TLB + page-walker (`hardware/rtl/atu.v:5-159`,
`src/utils/address_translation.cpp`, `src/fpga_engine/cache_engine.cpp:
118-140`) and the per-page hash map in `host/src/speckv_allocator.cpp:17-34`.

On TPU there is no address translation to accelerate — instead the paged
attention kernel gathers KV blocks through an int32 index array. The canonical
"virtual address" is simply `(seq_slot, block_idx)` (this replaces the four
mutually inconsistent bit-packed encodings of the reference, SURVEY.md
section 2.5 item 2), and the "TLB" is a dense `[max_seqs, max_blocks_per_seq]`
int32 table of physical HBM slot ids, mirrored host-side (scheduler writes)
and device-side (attention reads). Rows are refreshed to the device lazily and
only when changed, minimizing per-step H2D traffic (SURVEY.md section 7.3,
"device/host block-table consistency").
"""

from __future__ import annotations

import numpy as np

# Sentinel physical slot for unmapped logical blocks. The paged-attention
# kernels clamp gathers on it and mask the contribution, so a stray gather of
# slot 0 never corrupts results.
INVALID_SLOT = -1


class BlockTable:
    """Dense per-sequence-slot table of physical HBM block slots."""

    def __init__(self, max_seqs: int, max_blocks_per_seq: int):
        self.max_seqs = max_seqs
        self.max_blocks_per_seq = max_blocks_per_seq
        self._table = np.full((max_seqs, max_blocks_per_seq), INVALID_SLOT, dtype=np.int32)
        self._row_dirty = np.ones(max_seqs, dtype=bool)  # force initial upload
        self._device_table = None  # lazily materialized jax.Array

    # -- host-side mutation (scheduler) -------------------------------------

    def set(self, seq_slot: int, block_idx: int, hbm_slot: int) -> None:
        self._table[seq_slot, block_idx] = hbm_slot
        self._row_dirty[seq_slot] = True

    def clear_row(self, seq_slot: int) -> None:
        self._table[seq_slot, :] = INVALID_SLOT
        self._row_dirty[seq_slot] = True

    def get(self, seq_slot: int, block_idx: int) -> int:
        return int(self._table[seq_slot, block_idx])

    def row(self, seq_slot: int) -> np.ndarray:
        return self._table[seq_slot]

    # -- device-side view (attention) ---------------------------------------

    @property
    def host_array(self) -> np.ndarray:
        return self._table

    def device_array(self, put=None):
        """Return the device-resident table, re-uploading only if any row
        changed since the last call.

        `put` lets callers supply a sharded `jax.device_put` (e.g. replicated
        over the mesh); defaults to plain `jax.device_put`.
        """
        if self._device_table is None or self._row_dirty.any():
            import jax

            put = put or jax.device_put
            # Clamp the sentinel to slot 0 for safe gathers; validity is
            # carried separately by sequence lengths (a gather past seq_len
            # is masked out of the attention softmax).
            safe = np.maximum(self._table, 0)
            self._device_table = put(safe)
            self._row_dirty[:] = False
        return self._device_table

    @property
    def dirty_rows(self) -> np.ndarray:
        return np.flatnonzero(self._row_dirty)
