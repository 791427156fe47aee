// extern "C" surface over the native residency directory — the analog of
// the reference C API (host/include/speckv.h, host/src/speckv_c_api.cpp),
// consumed from Python via ctypes (cxl_speckv_tpu/native/__init__.py).
// Handle-based, status codes negative on error (speckv_runtime.hpp Status).

#include <cstdint>
#include <mutex>
#include <unordered_map>

#include "speckv_runtime.hpp"

using speckv::BlockPool;
using speckv::ResidencyDirectory;

namespace {
std::mutex g_mu;
std::unordered_map<uint64_t, ResidencyDirectory*> g_dirs;
std::unordered_map<uint64_t, BlockPool*> g_pools;
uint64_t g_next = 1;

ResidencyDirectory* get(uint64_t h) {
  auto it = g_dirs.find(h);
  return it == g_dirs.end() ? nullptr : it->second;
}

BlockPool* pget(uint64_t h) {
  auto it = g_pools.find(h);
  return it == g_pools.end() ? nullptr : it->second;
}
}  // namespace

extern "C" {

struct SpeckvEntryInfo {
  int32_t state;
  int32_t hbm_slot;
  int32_t host_slot;
  int32_t dirty;
  int32_t pinned;
  int32_t prefetched;
  int64_t access_count;
  int64_t last_access;
};

uint64_t speckv_dir_create(int32_t hbm_blocks, int32_t host_blocks,
                           int32_t reserved_blocks, int32_t hot_threshold) {
  std::lock_guard<std::mutex> lk(g_mu);
  uint64_t h = g_next++;
  g_dirs[h] = new ResidencyDirectory(hbm_blocks, host_blocks, reserved_blocks,
                                     hot_threshold);
  return h;
}

void speckv_dir_destroy(uint64_t h) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_dirs.find(h);
  if (it != g_dirs.end()) {
    delete it->second;
    g_dirs.erase(it);
  }
}

int64_t speckv_dir_allocate(uint64_t h, int32_t pinned) {
  ResidencyDirectory* d = get(h);
  return d ? d->Allocate(pinned != 0) : -1;
}

int64_t speckv_dir_allocate_host(uint64_t h) {
  ResidencyDirectory* d = get(h);
  return d ? d->AllocateHost() : -1;
}

int32_t speckv_dir_free_block(uint64_t h, int64_t bid) {
  ResidencyDirectory* d = get(h);
  return d ? d->FreeBlock(bid) : speckv::kErrUnknownBlock;
}

int32_t speckv_dir_access(uint64_t h, int64_t bid) {
  ResidencyDirectory* d = get(h);
  return d ? d->Access(bid) : speckv::kErrUnknownBlock;
}

int32_t speckv_dir_mark_dirty(uint64_t h, int64_t bid) {
  ResidencyDirectory* d = get(h);
  return d ? d->MarkDirty(bid) : speckv::kErrUnknownBlock;
}

int32_t speckv_dir_pin(uint64_t h, int64_t bid, int32_t pinned) {
  ResidencyDirectory* d = get(h);
  return d ? d->Pin(bid, pinned != 0) : speckv::kErrUnknownBlock;
}

int32_t speckv_dir_start_promote(uint64_t h, int64_t bid, int32_t prefetch,
                                 int32_t* host_slot, int32_t* hbm_slot) {
  ResidencyDirectory* d = get(h);
  return d ? d->StartPromote(bid, prefetch != 0, host_slot, hbm_slot)
           : speckv::kErrUnknownBlock;
}

int32_t speckv_dir_complete_promote(uint64_t h, int64_t bid) {
  ResidencyDirectory* d = get(h);
  return d ? d->CompletePromote(bid) : speckv::kErrUnknownBlock;
}

int32_t speckv_dir_start_demote(uint64_t h, int64_t bid, int32_t eviction,
                                int32_t* hbm_slot, int32_t* host_slot) {
  ResidencyDirectory* d = get(h);
  return d ? d->StartDemote(bid, eviction != 0, hbm_slot, host_slot)
           : speckv::kErrUnknownBlock;
}

int32_t speckv_dir_complete_demote(uint64_t h, int64_t bid) {
  ResidencyDirectory* d = get(h);
  return d ? d->CompleteDemote(bid) : speckv::kErrUnknownBlock;
}

int32_t speckv_dir_cancel_demote(uint64_t h, int64_t bid) {
  ResidencyDirectory* d = get(h);
  return d ? d->CancelDemote(bid) : speckv::kErrUnknownBlock;
}

int32_t speckv_dir_evict_candidates(uint64_t h, int32_t n, int64_t* out) {
  ResidencyDirectory* d = get(h);
  return d ? d->EvictCandidates(n, out) : speckv::kErrUnknownBlock;
}

int32_t speckv_dir_hbm_free(uint64_t h) {
  ResidencyDirectory* d = get(h);
  return d ? d->hbm_free() : -1;
}

int32_t speckv_dir_host_free(uint64_t h) {
  ResidencyDirectory* d = get(h);
  return d ? d->host_free() : -1;
}

int32_t speckv_dir_pressure(uint64_t h) {
  ResidencyDirectory* d = get(h);
  return d ? d->pressure() : -1;
}

int64_t speckv_dir_size(uint64_t h) {
  ResidencyDirectory* d = get(h);
  return d ? d->size() : -1;
}

int32_t speckv_dir_entry(uint64_t h, int64_t bid, SpeckvEntryInfo* out) {
  ResidencyDirectory* d = get(h);
  if (!d) return speckv::kErrUnknownBlock;
  const speckv::Entry* e = d->Find(bid);
  if (!e) return speckv::kErrUnknownBlock;
  out->state = static_cast<int32_t>(e->state);
  out->hbm_slot = e->hbm_slot;
  out->host_slot = e->host_slot;
  out->dirty = e->dirty ? 1 : 0;
  out->pinned = e->pinned ? 1 : 0;
  out->prefetched = e->prefetched ? 1 : 0;
  out->access_count = e->access_count;
  out->last_access = e->last_access;
  return speckv::kOk;
}

// stats as a flat int64 array in DirStats field order (14 counters)
int32_t speckv_dir_stats(uint64_t h, int64_t* out14) {
  ResidencyDirectory* d = get(h);
  if (!d) return speckv::kErrUnknownBlock;
  const speckv::DirStats& s = d->stats();
  const int64_t vals[14] = {
      s.accesses,      s.hbm_hits,     s.demand_misses,  s.inflight_hits,
      s.allocations,   s.frees,        s.promotions,     s.demotions,
      s.clean_drops,   s.evictions,    s.prefetch_fills, s.prefetch_hits,
      s.prefetch_wasted, s.oom_events};
  for (int i = 0; i < 14; ++i) out14[i] = vals[i];
  return speckv::kOk;
}

void speckv_dir_reset_stats(uint64_t h) {
  ResidencyDirectory* d = get(h);
  if (d) d->ResetStats();
}

int32_t speckv_dir_take_moved(uint64_t h, int64_t* out, int32_t cap) {
  ResidencyDirectory* d = get(h);
  return d ? d->TakeMoved(out, cap) : speckv::kErrUnknownBlock;
}

// live state histogram: out5 = [FREE, HBM, HOST, IN_FLIGHT_UP, IN_FLIGHT_DOWN]
int32_t speckv_dir_state_counts(uint64_t h, int64_t* out5) {
  ResidencyDirectory* d = get(h);
  if (!d) return speckv::kErrUnknownBlock;
  d->StateCounts(out5);
  return speckv::kOk;
}

// ---------------------------------------------------------------------------
// BlockPool C API — the reference SpeckvAllocator surface
// (host/include/speckv_allocator.hpp), adapted to the canonical
// (seq_slot, block_idx) identity
// ---------------------------------------------------------------------------

uint64_t speckv_pool_create(uint64_t dir_h, int32_t max_seqs,
                            int32_t max_blocks_per_seq, int32_t block_size) {
  std::lock_guard<std::mutex> lk(g_mu);
  ResidencyDirectory* d = get(dir_h);
  if (!d) return 0;
  uint64_t h = g_next++;
  g_pools[h] = new BlockPool(d, max_seqs, max_blocks_per_seq, block_size);
  return h;
}

void speckv_pool_destroy(uint64_t h) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_pools.find(h);
  if (it != g_pools.end()) {
    delete it->second;
    g_pools.erase(it);
  }
}

int32_t speckv_pool_add_seq(uint64_t h) {
  BlockPool* p = pget(h);
  return p ? p->AddSeq() : -1;
}

int32_t speckv_pool_free_seq(uint64_t h, int32_t slot) {
  BlockPool* p = pget(h);
  return p ? p->FreeSeq(slot) : speckv::kErrUnknownBlock;
}

int32_t speckv_pool_blocks_needed(uint64_t h, int32_t slot, int64_t total) {
  BlockPool* p = pget(h);
  return p ? p->BlocksNeeded(slot, total) : speckv::kErrUnknownBlock;
}

int32_t speckv_pool_extend(uint64_t h, int32_t slot, int64_t total) {
  BlockPool* p = pget(h);
  return p ? p->Extend(slot, total) : speckv::kErrUnknownBlock;
}

int32_t speckv_pool_retire_below(uint64_t h, int32_t slot, int32_t first,
                                 int64_t* idx_out, int64_t* bid_out,
                                 int32_t cap) {
  BlockPool* p = pget(h);
  return p ? p->RetireBelow(slot, first, idx_out, bid_out, cap)
           : speckv::kErrUnknownBlock;
}

void speckv_pool_reap_deferred(uint64_t h) {
  BlockPool* p = pget(h);
  if (p) p->ReapDeferred();
}

int32_t speckv_pool_refresh_slot(uint64_t h, int32_t slot, int32_t idx) {
  BlockPool* p = pget(h);
  return p ? p->RefreshSlot(slot, idx) : speckv::kErrUnknownBlock;
}

int64_t speckv_pool_locate(uint64_t h, int64_t bid, int32_t* block_idx) {
  BlockPool* p = pget(h);
  return p ? p->Locate(bid, block_idx) : -1;
}

int32_t speckv_pool_sync_moved(uint64_t h) {
  BlockPool* p = pget(h);
  return p ? p->SyncMoved() : speckv::kErrUnknownBlock;
}

int32_t speckv_pool_live_seqs(uint64_t h, int32_t* out, int32_t cap) {
  BlockPool* p = pget(h);
  return p ? p->LiveSeqs(out, cap) : speckv::kErrUnknownBlock;
}

int64_t speckv_pool_seq_tokens(uint64_t h, int32_t slot) {
  BlockPool* p = pget(h);
  return p ? p->SeqTokens(slot) : -1;
}

int32_t speckv_pool_seq_blocks(uint64_t h, int32_t slot, int64_t* out,
                               int32_t cap) {
  BlockPool* p = pget(h);
  return p ? p->SeqBlocks(slot, out, cap) : speckv::kErrUnknownBlock;
}

int64_t speckv_pool_last_block(uint64_t h, int32_t slot) {
  BlockPool* p = pget(h);
  return p ? p->LastBlock(slot) : -1;
}

int32_t speckv_pool_has_seq(uint64_t h, int32_t slot) {
  BlockPool* p = pget(h);
  return p ? (p->HasSeq(slot) ? 1 : 0) : 0;
}

int32_t* speckv_pool_table(uint64_t h) {
  BlockPool* p = pget(h);
  return p ? p->table_data() : nullptr;
}

int32_t speckv_pool_is_live(uint64_t h, int64_t bid) {
  BlockPool* p = pget(h);
  return p ? (p->IsLive(bid) ? 1 : 0) : 0;
}

int32_t speckv_pool_share_block(uint64_t h, int32_t slot, int64_t bid) {
  BlockPool* p = pget(h);
  return p ? p->ShareBlock(slot, bid) : speckv::kErrUnknownBlock;
}

// stats as a flat int64 array in PoolStats field order (7 counters)
int32_t speckv_pool_stats(uint64_t h, int64_t* out7) {
  BlockPool* p = pget(h);
  if (!p) return speckv::kErrUnknownBlock;
  const speckv::PoolStats& s = p->stats();
  const int64_t vals[7] = {s.seqs_allocated,  s.seqs_freed,
                           s.blocks_allocated, s.blocks_freed,
                           s.peak_blocks,      s.alloc_failures,
                           s.blocks_shared};
  for (int i = 0; i < 7; ++i) out7[i] = vals[i];
  return speckv::kOk;
}

void speckv_pool_reset_stats(uint64_t h) {
  BlockPool* p = pget(h);
  if (p) p->ResetStats();
}

}  // extern "C"
