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

// ---------------------------------------------------------------------------
// BlockPool (see speckv_runtime.hpp; mirrors core/block_pool.py exactly)
// ---------------------------------------------------------------------------

namespace speckv {

int32_t BlockPool::AddSeq() {
  if (free_slots_.empty()) return -1;
  const int32_t slot = free_slots_.back();
  free_slots_.pop_back();
  seqs_.emplace(slot, SeqAlloc{});
  ++stats_.seqs_allocated;
  return slot;
}

void BlockPool::FreeBlockDeferred(int64_t bid, int32_t slot, int32_t idx) {
  auto lit = bid_loc_.find(bid);
  if (lit != bid_loc_.end()) {
    auto& locs = lit->second;
    for (size_t i = 0; i < locs.size(); ++i) {
      if (locs[i].first == slot && locs[i].second == idx) {
        locs.erase(locs.begin() + i);
        break;
      }
    }
  }
  auto rit = refs_.find(bid);
  const int32_t refs = (rit == refs_.end() ? 1 : rit->second) - 1;
  if (refs > 0) {
    rit->second = refs;  // still shared by another sequence
    return;
  }
  refs_.erase(bid);
  bid_loc_.erase(bid);
  const Entry* e = dir_->Find(bid);
  if (e != nullptr && (e->state == BlockState::kInFlightUp ||
                       e->state == BlockState::kInFlightDown)) {
    // mid-transfer: the transfer engine completes first; reaped later
    deferred_free_.push_back(bid);
  } else {
    dir_->FreeBlock(bid);
    ++stats_.blocks_freed;
  }
}

int32_t BlockPool::FreeSeq(int32_t slot) {
  auto it = seqs_.find(slot);
  if (it == seqs_.end()) return kErrUnknownBlock;
  const auto& blocks = it->second.blocks;
  for (int32_t i = 0; i < static_cast<int32_t>(blocks.size()); ++i) {
    if (blocks[i] >= 0) FreeBlockDeferred(blocks[i], slot, i);
  }
  seqs_.erase(it);
  for (int32_t i = 0; i < max_blocks_; ++i) Cell(slot, i) = -1;
  free_slots_.push_back(slot);
  ++stats_.seqs_freed;
  return kOk;
}

int32_t BlockPool::BlocksNeeded(int32_t slot, int64_t new_total) const {
  auto it = seqs_.find(slot);
  if (it == seqs_.end()) return kErrUnknownBlock;
  const int64_t want = (new_total + block_size_ - 1) / block_size_;
  const int64_t have = static_cast<int64_t>(it->second.blocks.size());
  return static_cast<int32_t>(want > have ? want - have : 0);
}

int64_t BlockPool::LiveBlockCount() const {
  int64_t n = 0;
  for (const auto& [slot, seq] : seqs_) {
    for (int64_t bid : seq.blocks) n += (bid >= 0);
  }
  return n;
}

int32_t BlockPool::Extend(int32_t slot, int64_t new_total) {
  auto it = seqs_.find(slot);
  if (it == seqs_.end()) return kErrUnknownBlock;
  SeqAlloc& seq = it->second;
  const int32_t need = BlocksNeeded(slot, new_total);
  for (int32_t i = 0; i < need; ++i) {
    // born unpinned: only the active decode batch pins (pinned-at-birth
    // would deadlock the pool once prefills exceed HBM)
    const int64_t bid = dir_->Allocate(/*pinned=*/false);
    if (bid < 0) {
      ++stats_.alloc_failures;
      return 0;  // OOM -> scheduler backpressure
    }
    const Entry* e = dir_->Find(bid);
    const int32_t idx = static_cast<int32_t>(seq.blocks.size());
    if (idx >= max_blocks_) {
      // table-capacity overflow (Python raises IndexError; callers clamp
      // at admission) — release the fresh block and report
      dir_->FreeBlock(bid);
      return kErrBadState;
    }
    Cell(slot, idx) = e->hbm_slot;
    bid_loc_[bid] = {{slot, idx}};
    refs_[bid] = 1;
    seq.blocks.push_back(bid);
    ++stats_.blocks_allocated;
  }
  seq.num_tokens = new_total;
  const int64_t live = LiveBlockCount();
  if (live > stats_.peak_blocks) stats_.peak_blocks = live;
  return 1;
}

int32_t BlockPool::RetireBelow(int32_t slot, int32_t first_live,
                               int64_t* idx_out, int64_t* bid_out,
                               int32_t cap) {
  auto it = seqs_.find(slot);
  if (it == seqs_.end()) return kErrUnknownBlock;
  SeqAlloc& seq = it->second;
  const int32_t stop = std::min<int32_t>(
      first_live, static_cast<int32_t>(seq.blocks.size()));
  int32_t n = 0;
  for (int32_t i = 0; i < stop; ++i) {
    const int64_t bid = seq.blocks[i];
    if (bid < 0) continue;
    seq.blocks[i] = -1;
    FreeBlockDeferred(bid, slot, i);
    if (n < cap) {
      idx_out[n] = i;
      bid_out[n] = bid;
    }
    ++n;
  }
  return n;
}

void BlockPool::ReapDeferred() {
  std::vector<int64_t> still;
  for (int64_t bid : deferred_free_) {
    const Entry* e = dir_->Find(bid);
    if (e != nullptr && (e->state == BlockState::kInFlightUp ||
                         e->state == BlockState::kInFlightDown)) {
      still.push_back(bid);
    } else {
      dir_->FreeBlock(bid);
      ++stats_.blocks_freed;
    }
  }
  deferred_free_ = std::move(still);
}

int32_t BlockPool::RefreshSlot(int32_t slot, int32_t block_idx) {
  auto it = seqs_.find(slot);
  if (it == seqs_.end()) return kErrUnknownBlock;
  if (block_idx < 0 ||
      block_idx >= static_cast<int32_t>(it->second.blocks.size()))
    return kErrUnknownBlock;
  const int64_t bid = it->second.blocks[block_idx];
  if (bid < 0) return kErrUnknownBlock;
  const Entry* e = dir_->Find(bid);
  if (e == nullptr) return kErrUnknownBlock;
  Cell(slot, block_idx) = e->hbm_slot;
  return kOk;
}

int64_t BlockPool::Locate(int64_t bid, int32_t* block_idx) const {
  auto it = bid_loc_.find(bid);
  if (it == bid_loc_.end() || it->second.empty()) return -1;
  *block_idx = it->second.front().second;
  return it->second.front().first;
}

int32_t BlockPool::ShareBlock(int32_t slot, int64_t bid) {
  if (!IsLive(bid)) return kErrUnknownBlock;
  auto sit = seqs_.find(slot);
  if (sit == seqs_.end()) return kErrUnknownBlock;
  SeqAlloc& seq = sit->second;
  const Entry* e = dir_->Find(bid);
  if (e == nullptr) return kErrUnknownBlock;
  const int32_t idx = static_cast<int32_t>(seq.blocks.size());
  if (idx >= max_blocks_) return kErrBadState;
  ++refs_[bid];
  bid_loc_[bid].push_back({slot, idx});
  Cell(slot, idx) = e->hbm_slot;
  seq.blocks.push_back(bid);
  seq.num_tokens = static_cast<int64_t>(idx + 1) * block_size_;
  ++stats_.blocks_shared;
  return kOk;
}

int32_t BlockPool::SyncMoved() {
  int64_t buf[256];
  int32_t n = 0;
  for (;;) {
    const int32_t m = dir_->TakeMoved(buf, 256);
    for (int32_t i = 0; i < m; ++i) {
      auto it = bid_loc_.find(buf[i]);
      if (it == bid_loc_.end()) continue;
      const Entry* e = dir_->Find(buf[i]);
      if (e != nullptr && e->hbm_slot >= 0) {
        for (const auto& loc : it->second) {
          Cell(loc.first, loc.second) = e->hbm_slot;
          ++n;
        }
      }
    }
    if (m < 256) return n;
  }
}

int32_t BlockPool::LiveSeqs(int32_t* out, int32_t cap) const {
  int32_t n = 0;
  for (const auto& [slot, seq] : seqs_) {
    if (n < cap) out[n] = slot;
    ++n;
  }
  return n;
}

int64_t BlockPool::SeqTokens(int32_t slot) const {
  auto it = seqs_.find(slot);
  return it == seqs_.end() ? -1 : it->second.num_tokens;
}

int32_t BlockPool::SeqBlocks(int32_t slot, int64_t* out, int32_t cap) const {
  auto it = seqs_.find(slot);
  if (it == seqs_.end()) return kErrUnknownBlock;
  const auto& blocks = it->second.blocks;
  const int32_t n = static_cast<int32_t>(blocks.size());
  for (int32_t i = 0; i < n && i < cap; ++i) out[i] = blocks[i];
  return n;
}

int64_t BlockPool::LastBlock(int32_t slot) const {
  auto it = seqs_.find(slot);
  if (it == seqs_.end() || it->second.blocks.empty()) return -1;
  return it->second.blocks.back();
}

}  // namespace speckv
