// Implementation of the native residency directory. Semantics mirror
// cxl_speckv_tpu/core/directory.py exactly; see speckv_runtime.hpp.

#include "speckv_runtime.hpp"

#include <algorithm>

namespace speckv {

int64_t ResidencyDirectory::Allocate(bool pinned) {
  if (hbm_.empty() && ReclaimClean(1) == 0) {
    ++stats_.oom_events;
    return -1;
  }
  const int64_t bid = next_bid_++;
  ++clock_;
  Entry e;
  e.bid = bid;
  e.state = BlockState::kHbm;
  e.hbm_slot = hbm_.take();
  e.dirty = true;  // no host copy yet
  e.pinned = pinned;
  e.last_access = clock_;
  entries_.emplace(bid, e);
  ++stats_.allocations;
  return bid;
}

int64_t ResidencyDirectory::AllocateHost() {
  if (host_.empty()) {
    ++stats_.oom_events;
    return -1;
  }
  const int64_t bid = next_bid_++;
  ++clock_;
  Entry e;
  e.bid = bid;
  e.state = BlockState::kHost;
  e.host_slot = host_.take();
  e.last_access = clock_;
  entries_.emplace(bid, e);
  ++stats_.allocations;
  return bid;
}

int32_t ResidencyDirectory::FreeBlock(int64_t bid) {
  Entry* e = Get(bid);
  if (!e) return kErrUnknownBlock;
  if (e->state == BlockState::kInFlightUp ||
      e->state == BlockState::kInFlightDown) {
    return kErrInFlight;
  }
  if (e->prefetched) ++stats_.prefetch_wasted;
  if (e->hbm_slot >= 0) hbm_.put(e->hbm_slot);
  if (e->host_slot >= 0) host_.put(e->host_slot);
  entries_.erase(bid);
  moved_.erase(bid);
  ++stats_.frees;
  return kOk;
}

int32_t ResidencyDirectory::Access(int64_t bid) {
  Entry* e = Get(bid);
  if (!e) return kErrUnknownBlock;
  ++clock_;
  ++e->access_count;
  e->last_access = clock_;
  ++stats_.accesses;
  if (e->prefetched) {
    e->prefetched = false;
    ++stats_.prefetch_hits;
  }
  switch (e->state) {
    case BlockState::kHbm:
    case BlockState::kInFlightDown:
      ++stats_.hbm_hits;
      break;
    case BlockState::kInFlightUp:
      ++stats_.inflight_hits;
      break;
    case BlockState::kHost:
      ++stats_.demand_misses;
      break;
    default:
      return kErrBadState;
  }
  return static_cast<int32_t>(e->state);
}

int32_t ResidencyDirectory::MarkDirty(int64_t bid) {
  Entry* e = Get(bid);
  if (!e) return kErrUnknownBlock;
  if (e->state != BlockState::kHbm) return kErrBadState;
  e->dirty = true;
  if (e->host_slot >= 0) {
    host_.put(e->host_slot);
    e->host_slot = -1;
  }
  return kOk;
}

int32_t ResidencyDirectory::Pin(int64_t bid, bool pinned) {
  Entry* e = Get(bid);
  if (!e) return kErrUnknownBlock;
  e->pinned = pinned;
  return kOk;
}

int32_t ResidencyDirectory::StartPromote(int64_t bid, bool prefetch,
                                         int32_t* host_slot,
                                         int32_t* hbm_slot) {
  Entry* e = Get(bid);
  if (!e) return kErrUnknownBlock;
  if (e->state != BlockState::kHost) return kErrBadState;
  if (hbm_.empty() && ReclaimClean(1) == 0) return kErrNoSlot;
  e->hbm_slot = hbm_.take();
  e->state = BlockState::kInFlightUp;
  e->prefetched = prefetch;
  *host_slot = e->host_slot;
  *hbm_slot = e->hbm_slot;
  return kOk;
}

int32_t ResidencyDirectory::CompletePromote(int64_t bid) {
  Entry* e = Get(bid);
  if (!e) return kErrUnknownBlock;
  if (e->state != BlockState::kInFlightUp) return kErrBadState;
  e->state = BlockState::kHbm;
  e->dirty = false;  // host copy retained as clean backing store
  // arrival counts as a touch so LRU eviction doesn't reclaim freshly
  // prefetched blocks before their turn (prefetch->evict thrash)
  e->last_access = ++clock_;
  moved_.insert(bid);
  ++stats_.promotions;
  if (e->prefetched) ++stats_.prefetch_fills;
  return kOk;
}

int32_t ResidencyDirectory::StartDemote(int64_t bid, bool eviction,
                                        int32_t* hbm_slot,
                                        int32_t* host_slot) {
  Entry* e = Get(bid);
  if (!e) return kErrUnknownBlock;
  if (e->state != BlockState::kHbm) return kErrBadState;
  if (e->pinned) return kErrPinned;
  if (eviction) ++stats_.evictions;
  if (!e->dirty && e->host_slot >= 0) {
    hbm_.put(e->hbm_slot);
    e->hbm_slot = -1;
    e->state = BlockState::kHost;
    ++stats_.clean_drops;
    if (e->prefetched) {
      e->prefetched = false;
      ++stats_.prefetch_wasted;
    }
    return 0;  // clean drop, no transfer needed
  }
  if (e->host_slot < 0) {
    if (host_.empty()) return kErrNoSlot;
    e->host_slot = host_.take();
  }
  e->state = BlockState::kInFlightDown;
  *hbm_slot = e->hbm_slot;
  *host_slot = e->host_slot;
  return 1;  // writeback required
}

int32_t ResidencyDirectory::CancelDemote(int64_t bid) {
  Entry* e = Get(bid);
  if (!e) return kErrUnknownBlock;
  if (e->state != BlockState::kInFlightDown) return kErrBadState;
  e->state = BlockState::kHbm;
  if (e->host_slot >= 0) {
    host_.put(e->host_slot);
    e->host_slot = -1;
  }
  return kOk;
}

int32_t ResidencyDirectory::CompleteDemote(int64_t bid) {
  Entry* e = Get(bid);
  if (!e) return kErrUnknownBlock;
  if (e->state != BlockState::kInFlightDown) return kErrBadState;
  hbm_.put(e->hbm_slot);
  e->hbm_slot = -1;
  e->dirty = false;
  e->state = BlockState::kHost;
  ++stats_.demotions;
  if (e->prefetched) {
    e->prefetched = false;
    ++stats_.prefetch_wasted;
  }
  return kOk;
}

int32_t ResidencyDirectory::ReclaimClean(int32_t n) {
  std::vector<Entry*> cands;
  for (auto& [bid, e] : entries_) {
    if (e.state == BlockState::kHbm && !e.pinned && !e.dirty &&
        e.host_slot >= 0) {
      cands.push_back(&e);
    }
  }
  std::sort(cands.begin(), cands.end(),
            [](const Entry* a, const Entry* b) {
              return a->last_access < b->last_access;
            });
  int32_t dropped = 0;
  for (Entry* e : cands) {
    if (dropped >= n) break;
    int32_t hs, ss;
    if (StartDemote(e->bid, /*eviction=*/true, &hs, &ss) == 0) ++dropped;
  }
  return dropped;
}

int32_t ResidencyDirectory::EvictCandidates(int32_t n, int64_t* out) const {
  struct Key {
    bool hot;
    int64_t last_access;
    bool dirty;
    int64_t bid;
  };
  std::vector<Key> cands;
  for (const auto& [bid, e] : entries_) {
    if (e.state == BlockState::kHbm && !e.pinned) {
      cands.push_back({e.access_count > hot_threshold_, e.last_access,
                       e.dirty, bid});
    }
  }
  std::sort(cands.begin(), cands.end(), [](const Key& a, const Key& b) {
    if (a.hot != b.hot) return !a.hot;
    if (a.last_access != b.last_access) return a.last_access < b.last_access;
    if (a.dirty != b.dirty) return !a.dirty;
    return a.bid < b.bid;
  });
  int32_t m = std::min<int32_t>(n, static_cast<int32_t>(cands.size()));
  for (int32_t i = 0; i < m; ++i) out[i] = cands[i].bid;
  return m;
}

int32_t ResidencyDirectory::TakeMoved(int64_t* out, int32_t cap) {
  int32_t m = 0;
  for (int64_t bid : moved_) {
    if (m >= cap) break;
    out[m++] = bid;
  }
  if (m == static_cast<int32_t>(moved_.size())) {
    moved_.clear();
  } else {
    auto it = moved_.begin();
    std::advance(it, m);
    moved_.erase(moved_.begin(), it);
  }
  return m;
}

}  // namespace speckv
