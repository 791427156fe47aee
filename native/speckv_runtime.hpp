// speckv_runtime — native block-residency directory for the TPU tiered KV
// cache.
//
// C++17 implementation of the host runtime's hot metadata path, the
// TPU-native counterpart of the reference's user-space C++ runtime
// (host/src/speckv_allocator.cpp, src/cxl_memory/coherence_manager.cpp):
// residency state machine, slot free-lists, LRU + hot-aware eviction, and
// the full statistics surface. Semantics are kept exactly equal to the
// Python implementation in cxl_speckv_tpu/core/directory.py — the Python
// state-machine test suite runs against both via ctypes.

#pragma once

#include <cstddef>
#include <cstdint>
#include <set>
#include <unordered_map>
#include <utility>
#include <vector>

namespace speckv {

enum class BlockState : int32_t {
  kFree = 0,
  kHbm = 1,
  kHost = 2,
  kInFlightUp = 3,
  kInFlightDown = 4,
};

// Error codes returned through the C API (negative), mirroring the
// reference's speckv_status_t style (host/include/speckv.h:12-18).
enum Status : int32_t {
  kOk = 0,
  kErrUnknownBlock = -1,
  kErrBadState = -2,
  kErrPinned = -3,
  kErrNoSlot = -4,
  kErrInFlight = -5,
};

struct Entry {
  int64_t bid = -1;
  BlockState state = BlockState::kFree;
  int32_t hbm_slot = -1;
  int32_t host_slot = -1;
  bool dirty = false;
  bool pinned = false;
  bool prefetched = false;
  int64_t access_count = 0;
  int64_t last_access = 0;
};

struct DirStats {
  int64_t accesses = 0;
  int64_t hbm_hits = 0;
  int64_t demand_misses = 0;
  int64_t inflight_hits = 0;
  int64_t allocations = 0;
  int64_t frees = 0;
  int64_t promotions = 0;
  int64_t demotions = 0;
  int64_t clean_drops = 0;
  int64_t evictions = 0;
  int64_t prefetch_fills = 0;
  int64_t prefetch_hits = 0;
  int64_t prefetch_wasted = 0;
  int64_t oom_events = 0;
};

class SlotPool {
 public:
  explicit SlotPool(int32_t capacity) {
    free_.reserve(capacity);
    for (int32_t i = capacity - 1; i >= 0; --i) free_.push_back(i);
  }
  bool empty() const { return free_.empty(); }
  int32_t take() {
    int32_t s = free_.back();
    free_.pop_back();
    return s;
  }
  void put(int32_t slot) { free_.push_back(slot); }
  int32_t num_free() const { return static_cast<int32_t>(free_.size()); }

 private:
  std::vector<int32_t> free_;
};

class ResidencyDirectory {
 public:
  ResidencyDirectory(int32_t hbm_blocks, int32_t host_blocks,
                     int32_t reserved_blocks, int32_t hot_threshold)
      : hbm_(hbm_blocks),
        host_(host_blocks),
        reserved_(reserved_blocks),
        hot_threshold_(hot_threshold) {}

  int64_t Allocate(bool pinned);
  // Host-tier-direct allocation (streamed sequences whose KV never
  // enters the HBM pool); returns -1 on host exhaustion.
  int64_t AllocateHost();
  int32_t FreeBlock(int64_t bid);
  int32_t Access(int64_t bid);  // >= 0: BlockState; < 0: error
  int32_t MarkDirty(int64_t bid);
  int32_t Pin(int64_t bid, bool pinned);
  int32_t StartPromote(int64_t bid, bool prefetch, int32_t* host_slot,
                       int32_t* hbm_slot);
  int32_t CompletePromote(int64_t bid);
  // returns 1 when a writeback copy is required, 0 on instant clean drop
  int32_t StartDemote(int64_t bid, bool eviction, int32_t* hbm_slot,
                      int32_t* host_slot);
  int32_t CompleteDemote(int64_t bid);
  int32_t CancelDemote(int64_t bid);
  int32_t EvictCandidates(int32_t n, int64_t* out) const;

  int32_t hbm_free() const { return hbm_.num_free(); }
  int32_t host_free() const { return host_.num_free(); }
  int32_t pressure() const {
    int32_t p = reserved_ - hbm_.num_free();
    return p > 0 ? p : 0;
  }
  int64_t size() const { return static_cast<int64_t>(entries_.size()); }
  const Entry* Find(int64_t bid) const {
    auto it = entries_.find(bid);
    return it == entries_.end() ? nullptr : &it->second;
  }
  int32_t TakeMoved(int64_t* out, int32_t cap);
  void StateCounts(int64_t* out5) const {
    for (int i = 0; i < 5; ++i) out5[i] = 0;
    for (const auto& [bid, e] : entries_) {
      ++out5[static_cast<int32_t>(e.state)];
    }
  }
  const DirStats& stats() const { return stats_; }
  void ResetStats() { stats_ = DirStats{}; }

 private:
  Entry* Get(int64_t bid) {
    auto it = entries_.find(bid);
    return it == entries_.end() ? nullptr : &it->second;
  }
  int32_t ReclaimClean(int32_t n);

  std::unordered_map<int64_t, Entry> entries_;
  SlotPool hbm_;
  SlotPool host_;
  int32_t reserved_;
  int32_t hot_threshold_;
  int64_t next_bid_ = 0;
  int64_t clock_ = 0;
  std::set<int64_t> moved_;
  DirStats stats_;
};

// ---------------------------------------------------------------------------
// BlockPool — per-sequence KV block allocator over the directory, the native
// counterpart of cxl_speckv_tpu/core/block_pool.py (reference analog:
// host/src/speckv_allocator.cpp SpeckvAllocator). Owns the dense
// [max_seqs, max_blocks_per_seq] logical->physical block table; Python maps
// it zero-copy as a numpy view (table_data()), so the engine's packed-H2D
// row reads need no marshalling.
// ---------------------------------------------------------------------------

struct PoolStats {
  int64_t seqs_allocated = 0;
  int64_t seqs_freed = 0;
  int64_t blocks_allocated = 0;
  int64_t blocks_freed = 0;
  int64_t peak_blocks = 0;
  int64_t alloc_failures = 0;
  int64_t blocks_shared = 0;  // prefix-cache share events (extra refs)
};

struct SeqAlloc {
  int64_t num_tokens = 0;
  // logical bids, position-indexed (block_idx == pos // block_size);
  // -1 marks entries retired by a sliding window (position stays valid)
  std::vector<int64_t> blocks;
};

class BlockPool {
 public:
  BlockPool(ResidencyDirectory* dir, int32_t max_seqs,
            int32_t max_blocks_per_seq, int32_t block_size)
      : dir_(dir),
        max_seqs_(max_seqs),
        max_blocks_(max_blocks_per_seq),
        block_size_(block_size),
        table_(static_cast<size_t>(max_seqs) * max_blocks_per_seq, -1) {
    free_slots_.reserve(max_seqs);
    for (int32_t i = max_seqs - 1; i >= 0; --i) free_slots_.push_back(i);
  }

  int32_t AddSeq();                       // slot, or -1 when all busy
  int32_t FreeSeq(int32_t slot);
  int32_t BlocksNeeded(int32_t slot, int64_t new_total_tokens) const;
  // 1 = ok, 0 = OOM (no HBM slot; scheduler backpressure), < 0 = error
  int32_t Extend(int32_t slot, int64_t new_total_tokens);
  // frees leading out-of-window blocks; writes (block_idx, bid) pairs
  int32_t RetireBelow(int32_t slot, int32_t first_live, int64_t* idx_out,
                      int64_t* bid_out, int32_t cap);
  void ReapDeferred();
  int32_t RefreshSlot(int32_t slot, int32_t block_idx);
  // seq_slot holding bid (block_idx via out), or -1
  int64_t Locate(int64_t bid, int32_t* block_idx) const;
  int32_t SyncMoved();
  // prefix caching: refcounted read-only sharing of full prompt blocks
  bool IsLive(int64_t bid) const {
    auto it = refs_.find(bid);
    return it != refs_.end() && it->second > 0;
  }
  int32_t ShareBlock(int32_t slot, int64_t bid);

  int32_t LiveSeqs(int32_t* out, int32_t cap) const;
  int64_t SeqTokens(int32_t slot) const;
  int32_t SeqBlocks(int32_t slot, int64_t* out, int32_t cap) const;
  int64_t LastBlock(int32_t slot) const;
  bool HasSeq(int32_t slot) const {
    return seqs_.find(slot) != seqs_.end();
  }

  int32_t* table_data() { return table_.data(); }
  int32_t max_seqs() const { return max_seqs_; }
  int32_t max_blocks() const { return max_blocks_; }
  const PoolStats& stats() const { return stats_; }
  void ResetStats() { stats_ = PoolStats{}; }

 private:
  void FreeBlockDeferred(int64_t bid, int32_t slot, int32_t idx);
  int32_t& Cell(int32_t slot, int32_t idx) {
    return table_[static_cast<size_t>(slot) * max_blocks_ + idx];
  }
  int64_t LiveBlockCount() const;

  ResidencyDirectory* dir_;
  int32_t max_seqs_;
  int32_t max_blocks_;
  int32_t block_size_;
  std::vector<int32_t> table_;
  std::vector<int32_t> free_slots_;
  std::vector<int64_t> deferred_free_;
  std::unordered_map<int32_t, SeqAlloc> seqs_;
  std::unordered_map<int64_t, std::vector<std::pair<int32_t, int32_t>>>
      bid_loc_;
  std::unordered_map<int64_t, int32_t> refs_;
  PoolStats stats_;
};

}  // namespace speckv
