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

#include <cstdint>
#include <set>
#include <unordered_map>
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

}  // namespace speckv
