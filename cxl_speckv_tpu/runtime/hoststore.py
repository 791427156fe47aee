"""Device-side host-DRAM block store + in-graph migration program.

TPU-native realization of the reference's CXL memory pool *as deployed*:
the pooled tier lives in the TPU host's DRAM as `memory_kind="pinned_host"`
jax.Arrays (SURVEY.md section 7.0 concept-map row 1), and block migration is
a single XLA program that DMAs blocks host<->HBM on the device's own DMA
engines — the direct analog of the FPGA DMA engine moving lines between the
CXL pool and GPU HBM (`hardware/rtl/dma_engine.v:5-219`,
`hardware/rtl/cxl_mem_if.v:5-120`) with no host-process copy on the path.

Contrast with `runtime/transfer.py`'s legacy numpy backend (kept as the
pageable fallback): there every promote crosses the host process
(numpy -> H2D) and every writeback lands in pageable memory (D2H -> numpy).
Here the store arrays never leave the accelerator complex; the "transfer"
is a gather/scatter pair inside one jit program:

    promote:  slabs = store[up_host]   (host-memory gather, compute_on host)
              slabs -> device          (pinned-host -> HBM DMA)
              pools[:, up_hbm] = slabs
    demote:   slabs = pools[:, down_hbm]
              slabs -> host            (HBM -> pinned-host DMA)
              store[down_host] = slabs (host-memory scatter)

Because every program chains the pools and store arrays (donated through),
XLA dispatch order makes migration completion a *dataflow* fact: the moment
the migrate program is dispatched, any later program reading the pools sees
the promoted blocks and any later program reading the store sees the
written-back blocks. `poll_complete` (`speckv_allocator.cpp:132-134`'s
busy-wait) therefore has no analog at all — migrations retire at dispatch.

On CPU backends (tests) the same code runs with `pinned=False`: the store is
a plain device array (CPU device memory IS host DRAM) and the memory-space
annotations are skipped — identical semantics, one code path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# number of migration lanes per direction in one migrate program; fixed so
# one program compiles per pool geometry (the descriptor-ring depth analog)
MIGRATE_BATCH = 16


@dataclass(frozen=True)
class StoreOps:
    """Static (hashable) description of how store arrays move between memory
    spaces — closed over by the jitted migrate/fused programs.

    pinned=False (CPU / tests): no memory-kind annotations; gather/scatter
    are ordinary device ops. pinned=True (TPU): the store lives in
    pinned_host memory; gathers/scatters run as host computations
    (`compute_on("device_host")`) and slabs cross via in-graph device_put.
    """

    pinned: bool
    host_kv: Any = None    # sharding of kv store arrays in host memory
    host_sc: Any = None    # sharding of scale store arrays in host memory
    dev_kv: Any = None     # sharding of kv slabs on device
    dev_sc: Any = None

    def _host_ctx(self):
        if self.pinned:
            from jax.experimental import compute_on
            return compute_on.compute_on("device_host")
        import contextlib
        return contextlib.nullcontext()

    def fetch(self, stores, slots):
        """Gather `slots` from the store -> device slabs.

        stores: (k, v, ks, vs) host arrays [Sh+1, L, Hkv, bs, *]
        slots:  [M] int32 (device); pads point at the store guard row.
        Returns (kd, vd, ksd, vsd) device slabs [M, L, Hkv, bs, *].
        """
        hk, hv, hks, hvs = stores
        if self.pinned:
            slots = jax.device_put(slots, self.host_sc_index())
        with self._host_ctx():
            kd, vd = hk[slots], hv[slots]
            ksd, vsd = hks[slots], hvs[slots]
        if self.pinned:
            kd = jax.device_put(kd, self.dev_kv)
            vd = jax.device_put(vd, self.dev_kv)
            ksd = jax.device_put(ksd, self.dev_sc)
            vsd = jax.device_put(vsd, self.dev_sc)
        return kd, vd, ksd, vsd

    def stash(self, stores, slabs, slots):
        """Scatter device slabs into `slots` of the store; returns new store
        arrays. Pads point at the store guard row (harmlessly overwritten)."""
        hk, hv, hks, hvs = stores
        kd, vd, ksd, vsd = slabs
        if self.pinned:
            slots = jax.device_put(slots, self.host_sc_index())
            kd = jax.device_put(kd, self.host_kv)
            vd = jax.device_put(vd, self.host_kv)
            ksd = jax.device_put(ksd, self.host_sc)
            vsd = jax.device_put(vsd, self.host_sc)
        with self._host_ctx():
            hk = hk.at[slots].set(kd)
            hv = hv.at[slots].set(vd)
            hks = hks.at[slots].set(ksd)
            hvs = hvs.at[slots].set(vsd)
        return hk, hv, hks, hvs

    def host_sc_index(self):
        """Sharding for small index arrays in host memory."""
        return self._replicated_host

    @property
    def _replicated_host(self):
        # derive a host-memory sharding for rank-1 index arrays from the
        # kv sharding's device set
        from jax.sharding import NamedSharding, PartitionSpec, SingleDeviceSharding
        s = self.host_kv
        if isinstance(s, SingleDeviceSharding):
            return s
        if isinstance(s, NamedSharding):
            return NamedSharding(s.mesh, PartitionSpec(),
                                 memory_kind="pinned_host")
        raise TypeError(f"unsupported host sharding {type(s)}")


def single_device_store_ops(device=None, pinned: bool | None = None) -> StoreOps:
    from jax.sharding import SingleDeviceSharding

    if device is None:
        device = jax.devices()[0]
    if pinned is None:
        pinned = device.platform == "tpu"
    if not pinned:
        return StoreOps(pinned=False)
    host = SingleDeviceSharding(device, memory_kind="pinned_host")
    dev = SingleDeviceSharding(device)
    return StoreOps(pinned=True, host_kv=host, host_sc=host,
                    dev_kv=dev, dev_sc=dev)


def mesh_store_ops(mesh, pinned: bool | None = None) -> StoreOps:
    """Store ops for a dp x tp mesh: the store shards its kv-head axis over
    tp (matching `parallel.sharding.pool_specs`) so each chip's host DMA
    moves only its own heads' slice of every block."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if pinned is None:
        pinned = all(d.platform == "tpu" for d in mesh.devices.flat)
    kv_spec = P(None, None, "tp", None, None)   # [M/Sh, L, Hkv, bs, Dp]
    sc_spec = P(None, None, "tp", None)
    if not pinned:
        return StoreOps(pinned=False)
    return StoreOps(
        pinned=True,
        host_kv=NamedSharding(mesh, kv_spec, memory_kind="pinned_host"),
        host_sc=NamedSharding(mesh, sc_spec, memory_kind="pinned_host"),
        dev_kv=NamedSharding(mesh, kv_spec),
        dev_sc=NamedSharding(mesh, sc_spec),
    )


class DeviceHostStore:
    """The host-DRAM tier as device-managed arrays (+1 guard row).

    Layout (block spans all layers — the migration granularity):
        k, v   [host_slots + 1, L, Hkv, bs, D/pack]
        ks, vs [host_slots + 1, L, Hkv, bs] float32
    """

    def __init__(self, host_slots: int, num_layers: int, block_size: int,
                 num_kv_heads: int, head_dim_packed: int, kv_elem_dtype,
                 ops: StoreOps):
        self.ops = ops
        self.host_slots = host_slots
        shape = (host_slots + 1, num_layers, num_kv_heads, block_size,
                 head_dim_packed)
        sshape = shape[:-1]
        put_kv = (partial(jax.device_put, device=ops.host_kv)
                  if ops.pinned else jax.device_put)
        put_sc = (partial(jax.device_put, device=ops.host_sc)
                  if ops.pinned else jax.device_put)
        self.k = put_kv(jnp.zeros(shape, kv_elem_dtype))
        self.v = put_kv(jnp.zeros(shape, kv_elem_dtype))
        self.ks = put_sc(jnp.ones(sshape, jnp.float32))
        self.vs = put_sc(jnp.ones(sshape, jnp.float32))

    @property
    def guard_slot(self) -> int:
        return self.host_slots

    @property
    def arrays(self):
        return (self.k, self.v, self.ks, self.vs)

    def set_arrays(self, arrays) -> None:
        self.k, self.v, self.ks, self.vs = arrays

    @property
    def bytes_per_block(self) -> int:
        per = (self.k.nbytes + self.v.nbytes + self.ks.nbytes + self.vs.nbytes)
        return per // self.k.shape[0]


def migrate_in_graph(pools, stores, mig, ops: StoreOps):
    """Traceable migration batch, both directions (used standalone by
    `migrate_program` and fused into the engine-round programs).

    mig: [4, M] int32 — rows (up_host, up_hbm, down_hbm, down_host); pad
    lanes point at the respective guard slots (pool slot S / store row Sh),
    which absorb garbage harmlessly.

    Demote gathers run against the PRE-promote pools (the demoted slots may
    be reused as promote targets in the same batch), then promotes scatter
    in. Within one batch the planner never routes the same block both ways.
    """
    k_pools, v_pools, k_scales, v_scales = pools
    up_host, up_hbm, down_hbm, down_host = mig[0], mig[1], mig[2], mig[3]

    # demote: pools -> store ([L, S, ...] -> slabs [M, L, ...])
    slabs = tuple(p[:, down_hbm].swapaxes(0, 1) for p in pools)
    stores = ops.stash(stores, slabs, down_host)

    # promote: store -> pools
    kd, vd, ksd, vsd = ops.fetch(stores, up_host)
    k_pools = k_pools.at[:, up_hbm].set(kd.swapaxes(0, 1))
    v_pools = v_pools.at[:, up_hbm].set(vd.swapaxes(0, 1))
    k_scales = k_scales.at[:, up_hbm].set(ksd.swapaxes(0, 1))
    v_scales = v_scales.at[:, up_hbm].set(vsd.swapaxes(0, 1))
    return (k_pools, v_pools, k_scales, v_scales), stores


@partial(jax.jit, static_argnames=("ops",),
         donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def migrate_program(k_pools, v_pools, k_scales, v_scales,
                    k_store, v_store, ks_store, vs_store,
                    mig, *, ops: StoreOps):
    """Standalone migration dispatch (see `migrate_in_graph`)."""
    pools, stores = migrate_in_graph(
        (k_pools, v_pools, k_scales, v_scales),
        (k_store, v_store, ks_store, vs_store), mig, ops)
    return pools + stores


def pad_migration(ups, downs, pool_guard: int, store_guard: int,
                  batch: int = MIGRATE_BATCH) -> np.ndarray:
    """Build the [4, M] mig array from up/down slot pair lists.

    ups:   [(host_slot, hbm_slot), ...]
    downs: [(hbm_slot, host_slot), ...]
    """
    m = max(batch, len(ups), len(downs))
    mig = np.empty((4, m), np.int32)
    mig[0] = store_guard
    mig[1] = pool_guard
    mig[2] = pool_guard
    mig[3] = store_guard
    for i, (hs, ds) in enumerate(ups):
        mig[0, i], mig[1, i] = hs, ds
    for i, (ds, hs) in enumerate(downs):
        mig[2, i], mig[3, i] = ds, hs
    return mig
