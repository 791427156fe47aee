// extern "C" surface over the native residency directory — the analog of
// the reference C API (host/include/speckv.h, host/src/speckv_c_api.cpp),
// consumed from Python via ctypes (cxl_speckv_tpu/native/__init__.py).
// Handle-based, status codes negative on error (speckv_runtime.hpp Status).

#include <cstdint>
#include <mutex>
#include <unordered_map>

#include "speckv_runtime.hpp"

using speckv::ResidencyDirectory;

namespace {
std::mutex g_mu;
std::unordered_map<uint64_t, ResidencyDirectory*> g_dirs;
uint64_t g_next = 1;

ResidencyDirectory* get(uint64_t h) {
  auto it = g_dirs.find(h);
  return it == g_dirs.end() ? nullptr : it->second;
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

}  // extern "C"
