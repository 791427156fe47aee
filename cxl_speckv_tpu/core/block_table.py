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
int32 table of physical HBM slot ids held host-side. Active lanes' rows ride
to the device inside each round's single packed int32 array (one H2D per
dispatch — see `engine/engine.py`), where the attention kernels read them via
scalar-prefetched index maps.
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

    # -- host-side mutation (scheduler) -------------------------------------

    def set(self, seq_slot: int, block_idx: int, hbm_slot: int) -> None:
        self._table[seq_slot, block_idx] = hbm_slot

    def clear_row(self, seq_slot: int) -> None:
        self._table[seq_slot, :] = INVALID_SLOT

    def get(self, seq_slot: int, block_idx: int) -> int:
        return int(self._table[seq_slot, block_idx])

    def row(self, seq_slot: int) -> np.ndarray:
        return self._table[seq_slot]

    # -- whole-table view (debug / tests) -----------------------------------

    @property
    def host_array(self) -> np.ndarray:
        return self._table
