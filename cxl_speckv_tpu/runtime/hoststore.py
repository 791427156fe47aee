"""Device-side host-DRAM block store + in-graph migration.

TPU-native realization of the reference's CXL memory pool *as deployed*:
the pooled tier lives in the TPU host's DRAM as `memory_kind="pinned_host"`
jax.Arrays (SURVEY.md section 7.0 concept-map row 1), and block migration is
a single XLA program that DMAs blocks host<->HBM on the device's own DMA
engines — the direct analog of the FPGA DMA engine moving lines between the
CXL pool and GPU HBM (`hardware/rtl/dma_engine.v:5-219`,
`hardware/rtl/cxl_mem_if.v:5-120`) with no host-process copy on the path.

Layout: the store is ROW-major over (slot, layer):

    k, v   [(host_slots + 1) * L, Hkv, bs, D/pack]   row = slot * L + layer
    ks, vs [(host_slots + 1) * L, Hkv, bs] float32

One extra guard slot (its L rows) absorbs padded lanes. The flat layout
exists because XLA's host-memory space supports gather/scatter with a
SINGLE leading index array (verified on TPU v5e) — mixed advanced indexing
loses the memory-space annotation on the auxiliary index operands. Every
access pattern in this module reduces to leading-row gathers/scatters:

    whole-block migrate:  rows = slot*L + [0..L)      (fetch_blocks/stash_blocks)
    per-layer stream read: rows = slots*L + layer     (fetch_layer)

Because every program chains the pools and store arrays (donated through),
XLA dispatch order makes migration completion a *dataflow* fact: the moment
the migrate program is dispatched, any later program reading the pools sees
the promoted blocks and any later program reading the store sees the
written-back blocks. `poll_complete` (`speckv_allocator.cpp:132-134`'s
busy-wait) has no analog — migrations retire at dispatch.

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
    spaces — closed over by the jitted migrate/fused/streamed programs.

    pinned=False (CPU / tests): no memory-kind annotations; gather/scatter
    are ordinary device ops. pinned=True (TPU): the store lives in
    pinned_host memory; gathers/scatters run as host computations
    (`compute_on("device_host")`) and data crosses via in-graph device_put.
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

    def _idx_host(self, rows):
        if not self.pinned:
            return rows
        return jax.device_put(rows, self._replicated_host)

    # -- row primitives (the only access patterns host memory supports) -----

    def gather_rows(self, stores, rows):
        """stores: (k, v, ks, vs) host arrays; rows: [N] int32 row ids.
        Returns device slabs ([N, Hkv, bs, Dp] x2, [N, Hkv, bs] x2)."""
        hk, hv, hks, hvs = stores
        rows = self._idx_host(rows)
        with self._host_ctx():
            kd, vd, ksd, vsd = hk[rows], hv[rows], hks[rows], hvs[rows]
        if self.pinned:
            kd = jax.device_put(kd, self.dev_kv)
            vd = jax.device_put(vd, self.dev_kv)
            ksd = jax.device_put(ksd, self.dev_sc)
            vsd = jax.device_put(vsd, self.dev_sc)
        return kd, vd, ksd, vsd

    def scatter_rows(self, stores, slabs, rows):
        """Write device slabs into store rows; returns new store arrays."""
        hk, hv, hks, hvs = stores
        kd, vd, ksd, vsd = slabs
        rows = self._idx_host(rows)
        if self.pinned:
            kd = jax.device_put(kd, self.host_kv)
            vd = jax.device_put(vd, self.host_kv)
            ksd = jax.device_put(ksd, self.host_sc)
            vsd = jax.device_put(vsd, self.host_sc)
        with self._host_ctx():
            hk = hk.at[rows].set(kd)
            hv = hv.at[rows].set(vd)
            hks = hks.at[rows].set(ksd)
            hvs = hvs.at[rows].set(vsd)
        return hk, hv, hks, hvs

    # -- block-level (all layers of each slot) ------------------------------

    @staticmethod
    def block_rows(slots, num_layers: int):
        """[M] slot ids -> [M * L] row ids (slot-major)."""
        return (slots[:, None] * num_layers
                + jnp.arange(num_layers, dtype=slots.dtype)[None, :]).reshape(-1)

    def fetch_blocks(self, stores, slots, num_layers: int):
        """Gather whole blocks -> device slabs [M, L, Hkv, bs, *]."""
        m = slots.shape[0]
        kd, vd, ksd, vsd = self.gather_rows(
            stores, self.block_rows(slots, num_layers))
        rs = lambda x: x.reshape(m, num_layers, *x.shape[1:])
        return rs(kd), rs(vd), rs(ksd), rs(vsd)

    def stash_blocks(self, stores, slabs, slots, num_layers: int):
        """Scatter whole-block device slabs [M, L, Hkv, bs, *] into slots."""
        flat = tuple(x.reshape(-1, *x.shape[2:]) for x in slabs)
        return self.scatter_rows(stores, flat,
                                 self.block_rows(slots, num_layers))

    # -- per-layer stream read (used inside the model layer scan) -----------

    def fetch_layer(self, stores, slots, layer, num_layers: int):
        """Gather layer `layer` (traced scalar) of the given slots ->
        device slabs [W, Hkv, bs, *]. The layer index is pre-broadcast to
        the slots' shape so the combined row ids stay one index array."""
        rows = slots * num_layers + jnp.broadcast_to(
            jnp.asarray(layer, slots.dtype), slots.shape)
        return self.gather_rows(stores, rows)

    @property
    def _replicated_host(self):
        # host-memory sharding for index arrays, derived from the kv sharding
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
    kv_spec = P(None, "tp", None, None)   # rows [R, Hkv, bs, Dp]
    sc_spec = P(None, "tp", None)
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
    """The host-DRAM tier as device-managed arrays (see module docstring)."""

    def __init__(self, host_slots: int, num_layers: int, block_size: int,
                 num_kv_heads: int, head_dim_packed: int, kv_elem_dtype,
                 ops: StoreOps):
        self.ops = ops
        self.host_slots = host_slots
        self.num_layers = num_layers
        rows = (host_slots + 1) * num_layers
        shape = (rows, num_kv_heads, block_size, head_dim_packed)
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
        per_row = (self.k[0].nbytes + self.v[0].nbytes
                   + self.ks[0].nbytes + self.vs[0].nbytes)
        return per_row * self.num_layers


def migrate_in_graph(pools, stores, mig, ops: StoreOps):
    """Traceable migration batch, both directions (used standalone by
    `migrate_program` and fused into the engine-round programs).

    pools: [L, S, Hkv, bs, *]; stores: flat rows (see module docstring).
    mig: [4, M] int32 — rows (up_host, up_hbm, down_hbm, down_host) in SLOT
    units; pad lanes point at the guard slots, which absorb garbage.

    Demote gathers run against the PRE-promote pools (the demoted slots may
    be reused as promote targets in the same batch), then promotes scatter
    in. Within one batch the planner never routes the same block both ways.
    """
    from cxl_speckv_tpu.ops.paged_attention import kt_to_store, store_to_kt

    k_pools, v_pools, k_scales, v_scales = pools
    L = k_pools.shape[0]
    num_kv_heads = v_pools.shape[2]
    up_host, up_hbm, down_hbm, down_host = mig[0], mig[1], mig[2], mig[3]

    # demote: pools -> store ([L, S, ...] -> slabs [M, L, ...]). The store
    # keeps the token-major layout the streamed path reads, so K blocks
    # transpose between kT pool layout and store layout on the way (an
    # in-graph relayout of MIGRATE_BATCH blocks — negligible vs the copy).
    hkv_bs = v_pools.shape[2:4]
    def sc_to_store(s):     # [M, L, 1, Hkv*bs] -> [M, L, Hkv, bs] (free)
        return s.reshape(*s.shape[:2], *hkv_bs)
    def sc_from_store(s):   # inverse (free reshape, same byte order)
        return s.reshape(*s.shape[:2], 1, -1)
    slabs = (kt_to_store(k_pools[:, down_hbm].swapaxes(0, 1), num_kv_heads),
             v_pools[:, down_hbm].swapaxes(0, 1),
             sc_to_store(k_scales[:, down_hbm].swapaxes(0, 1)),
             sc_to_store(v_scales[:, down_hbm].swapaxes(0, 1)))
    stores = ops.stash_blocks(stores, slabs, down_host, L)

    # promote: store -> pools
    kd, vd, ksd, vsd = ops.fetch_blocks(stores, up_host, L)
    k_pools = k_pools.at[:, up_hbm].set(store_to_kt(kd).swapaxes(0, 1))
    v_pools = v_pools.at[:, up_hbm].set(vd.swapaxes(0, 1))
    k_scales = k_scales.at[:, up_hbm].set(sc_from_store(ksd).swapaxes(0, 1))
    v_scales = v_scales.at[:, up_hbm].set(sc_from_store(vsd).swapaxes(0, 1))
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
