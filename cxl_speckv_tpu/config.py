"""System configuration.

TPU-native analog of the reference's three config mechanisms
(`src/cxl_speckv_system.h:19-39` SystemConfig struct, constructor defaults,
and the runtime-mutable prefetch-depth / compression-scheme knobs flowing to
FPGA registers via `speckv.h:65-66`). Here everything is a dataclass; the
runtime-mutable knobs are `Engine.set_prefetch_depth` (mirror of
`speckv_set_prefetch_depth`) and `Engine.set_kv_dtype` (mirror of
`speckv_set_compression_scheme`: same-storage-width schemes switch LIVE —
subsequently allocated blocks quantize under the new scheme; cross-width
switches (INT4/BF16 <-> byte schemes) rebuild the pool storage on an idle
engine, spanning the reference knob's full FP16 <-> INT8_DELTA_RLE range).
"""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass, field


class KVDtype(str, enum.Enum):
    """KV-cache storage format.

    TPU-native replacement for the reference compression scheme enum
    `speckv.h:59-63` (SPECKV_COMP_FP16 / INT8 / INT8_DELTA_RLE). Delta+RLE is
    intentionally dropped: variable-length encoding is hostile to TPU vector
    units and defeats static addressing; fixed-ratio quantization achieves the
    same 2-4x with predictable layout (SURVEY.md section 7.0).
    """

    BF16 = "bf16"       # no compression (the FP16 analog)
    INT8 = "int8"       # 2x vs bf16, per-(token, head) scales
    INT4 = "int4"       # 4x vs bf16, packed two nibbles per byte
    FP8 = "fp8"         # 2x vs bf16, e4m3 with per-(token, head) scales
    # Internal marker for per-layer mixed INT8/FP8 pools
    # (CacheConfig.layer_kv_dtypes): compute programs receive MIXED8 as the
    # static scheme plus a traced per-layer scheme id selecting the
    # interpretation of the shared int8 byte storage. Not a valid pool
    # config value itself.
    MIXED8 = "mixed8"

    @property
    def compression_ratio(self) -> float:
        """Storage compression vs bf16, ignoring the small scale sideband."""
        return {"bf16": 1.0, "int8": 2.0, "int4": 4.0, "fp8": 2.0,
                "mixed8": 2.0}[self.value]


@dataclass
class CacheConfig:
    """Tiered paged-KV cache geometry.

    Analog of the reference tier sizing (`cxl_speckv_system.h:22-26`
    l1/l2/l3_size_gb). L1+L2 collapse into one HBM block pool (a reserved
    fraction acts as the prefetch landing zone, like the reference L2
    prefetch buffer); L3 becomes the host-DRAM pool.
    """

    block_size: int = 32                # tokens per KV block (the "page")
    num_hbm_blocks: int = 512           # HBM-resident slots (L1+L2 analog)
    num_host_blocks: int = 2048         # host-DRAM slots (the CXL-pool analog)
    kv_dtype: KVDtype = KVDtype.INT8
    # Fraction of HBM slots reserved as prefetch landing zone: eviction keeps
    # at least this many slots free so prefetches never stall on eviction
    # (analog of the dedicated L2 prefetch buffer, docs/ARCHITECTURE.md).
    prefetch_reserve_frac: float = 0.125
    # Hot-block threshold: blocks accessed more than this are never chosen
    # for demotion while hotter candidates exist (reference hot/cold
    # classification, access_count > 10, cxl_memory_manager.cpp:245-255).
    hot_access_threshold: int = 10
    # Per-layer compression schemes (the reference's per-layer ratio table,
    # `cache_engine.cpp:25-33`): entry i is layer i's scheme, INT8 or FP8
    # only (they share int8-byte storage, so one pool serves the mix; the
    # width-changing schemes INT4/BF16 stay engine-uniform, like the
    # hardware datapath width). None = uniform `kv_dtype` everywhere.
    # Mutually exclusive with the runtime scheme knob (Engine.set_kv_dtype).
    layer_kv_dtypes: tuple = None
    # Prefix caching: content-addressed reuse of full prompt-prefix blocks
    # across concurrently-live requests (shared system prompts). Matched
    # blocks are refcount-shared (read-only by construction: full prompt
    # blocks are never written again); generation is bit-identical to the
    # uncached path because the reused quantized KV bytes ARE what a fresh
    # prefill would write.
    enable_prefix_cache: bool = True
    # Host-tier backend: "device" keeps the pool in pinned-host device
    # memory (memory_kind="pinned_host" on TPU) and migrates blocks with
    # in-graph DMA (`runtime/hoststore.py` — the CXL-pool-as-deployed
    # analog); "numpy" is the pageable host-process fallback with staged
    # H2D/D2H copies (`runtime/transfer.py`).
    host_store_backend: str = "device"

    @property
    def num_reserved_blocks(self) -> int:
        return max(1, int(self.num_hbm_blocks * self.prefetch_reserve_frac))

    @property
    def total_blocks(self) -> int:
        return self.num_hbm_blocks + self.num_host_blocks

    def validate(self) -> None:
        if self.block_size <= 0 or self.block_size % 8:
            raise ValueError(f"block_size must be a positive multiple of 8, got {self.block_size}")
        if self.num_hbm_blocks <= 0:
            raise ValueError("num_hbm_blocks must be positive")
        if self.num_host_blocks < 0:
            raise ValueError("num_host_blocks must be >= 0")
        if self.host_store_backend not in ("device", "numpy"):
            raise ValueError(f"unknown host_store_backend {self.host_store_backend}")
        if self.kv_dtype == KVDtype.MIXED8:
            raise ValueError("MIXED8 is internal; set layer_kv_dtypes instead")
        if self.layer_kv_dtypes is not None:
            bad = [d for d in self.layer_kv_dtypes
                   if d not in (KVDtype.INT8, KVDtype.FP8)]
            if bad:
                raise ValueError(
                    f"layer_kv_dtypes entries must be INT8 or FP8, got {bad}")
            if self.kv_dtype not in (KVDtype.INT8, KVDtype.FP8):
                raise ValueError(
                    "layer_kv_dtypes requires a byte-storage kv_dtype")


@dataclass
class PrefetchConfig:
    """Speculative prefetcher knobs.

    Direct port of the reference adaptive-depth policy
    (`speculative_prefetcher.cpp:99-120`): sliding window of `window`
    outcomes, depth++ when recent accuracy > `raise_threshold` (cap
    `max_depth`), depth-- when < `lower_threshold` (floor `min_depth`);
    LSTM geometry from `lstm_predictor.cpp:14` (2 layers, 128 hidden,
    64-d embedding, history 16).

    Default OFF (r4, measured): on this runtime demand fetches are
    in-graph migrate programs that chain ahead of decode by dataflow, so
    a "miss" costs the same device bytes prefetch would move and never
    stalls the host — prefetch can only hide migrate execution under the
    host's inter-round gap, which is <1% of round time (bench phase
    split). Measured in BOTH a smooth round-robin regime (noprefetch
    ~15% faster, NOTES_ROUND3) and a stall-prone thrash regime
    (quantum=1 whole-group rotation: schedule-lookahead prefetch 106.1
    vs noprefetch 105.7 tok/s — a wash — while the LSTM's async worker
    costs ~9% in host-thread contention; NOTES_ROUND4). Turn it ON for
    runtimes where a slow-tier fetch genuinely stalls the accelerator
    (the reference's CXL premise), for EOS-gated traffic savings on
    bursty chat loads, or to exercise the full Algorithm-1 machinery.
    """

    enabled: bool = False
    depth: int = 4                      # initial top-k prediction depth
    min_depth: int = 2
    max_depth: int = 8
    accuracy_window: int = 100
    raise_threshold: float = 0.95
    lower_threshold: float = 0.85
    history_len: int = 16
    lstm_hidden: int = 128
    lstm_layers: int = 2
    embed_dim: int = 64
    # Max in-flight prefetch transfers (reference bounded DMA queue of 16,
    # speculative_prefetcher.cpp:162-172).
    max_inflight: int = 16
    # Online LSTM training on observed token streams (the reference's
    # load_model/save_model were stubs and its gates hardcoded — here the
    # predictor can actually learn while serving).
    train_online: bool = False
    train_interval: int = 8         # engine steps between training steps
    train_batch: int = 64
    # Run training steps on a background worker (the predictor lives on the
    # host CPU device, so training never contends with the TPU; measured
    # ~400ms per inline train step stalling the serving loop). False =
    # synchronous (deterministic tests / offline training loops).
    train_async: bool = True
    # Token ids hash into this many predictor classes (identity when the
    # model vocab is already smaller). Bounds the predictor's output matmul,
    # softmax, and embedding gradient regardless of model vocab — at 128k
    # vocab the un-bucketed versions cost ~100ms per engine step and a ~36s
    # XLA-CPU train compile (measured, round 2).
    vocab_buckets: int = 4096
    # Optional pretrained predictor checkpoint (LSTMPredictor.save format,
    # e.g. from scripts/train_predictor.py). Geometry must match
    # (min(vocab, vocab_buckets), embed_dim, lstm_hidden, lstm_layers).
    predictor_path: str | None = None
    replay_capacity: int = 4096
    # Continuation-probability refresh threshold, in observation batches
    # (~decode rounds) per sequence: the EOS-gate/rank prediction re-runs
    # only after this many new observations (staleness is benign for a
    # should-we-prefetch gate; measured on TPU, per-round refreshes cost
    # ~10% of serving throughput in host-thread contention — NOTES_ROUND3).
    pcont_refresh: int = 8
    # Seed n-gram speculative-decoding lookup MISSES with the LSTM's top-k
    # token-class predictions (mapped back to concrete tokens through the
    # lane's own history) — the predictor's predictions do serving work
    # beyond the EOS prefetch gate. Heuristic only: verify keeps the output
    # distribution exact regardless of draft quality.
    seed_ngram: bool = True
    # Run the LSTM's continue-probability INSIDE the fused decode program
    # (r5): the 2x128 cell's forward rides the decode round on the
    # accelerator — zero host dispatches and zero worker-thread contention
    # (the async pcont worker's existence measured ~9% of serving
    # throughput in the r4 thrash ablation). The post-round window a lane
    # computes for itself stays valid exactly until that lane decodes
    # again — the span the prefetch gate consults while the lane waits in
    # rotation. Lanes not served by a fused decode round (horizon=1
    # single-step path, spec rounds) fall back to the host-side refresh.
    ingraph_pcont: bool = True


@dataclass
class EngineConfig:
    """Continuous-batching engine knobs."""

    max_batch_size: int = 8             # concurrent decode slots
    max_seq_len: int = 2048
    # chunked-prefill tile (token count). A STATIC program width: size it
    # to the workload — below one chunk of prompt the padding wastes
    # compute (bench.py sizes it to its 64-token prompts; measured 2x on
    # the prefill phase), while LONG prompts want 512-1024: each chunk
    # dispatch pays the dispatch constant, and on the host-streamed path
    # re-gathers the whole prior context (total gather volume ~
    # prompt^2/chunk — r5 measured 2 x 2048-token streamed prompts at
    # chunk 128/256/512/1024: 5.0/3.1/2.1/1.6 s). Wide chunks run the
    # row-tiled chunk kernel (ops/chunk_attention_pallas.py r5).
    prefill_chunk: int = 256
    max_queue: int = 1024               # pending-request queue bound
    eos_token_id: int | None = None     # overrides model config when set
    # decode steps fused into one device program (in-graph sampling);
    # amortizes per-step dispatch overhead — tokens generated past a stop
    # condition are discarded host-side. Sizing (r4 round_anatomy, v5e
    # through a remote-dispatch runtime): ~25 ms of EVERY dispatch is
    # runtime overhead vs ~3.1 ms per fused step, so throughput rises
    # steeply with horizon (16 -> 32 measured +40% serving throughput)
    # until it collides with scheduling granularity: stop/cancel latency,
    # overshoot waste at finish boundaries, and rotation cadence
    # (sched_quantum counts ROUNDS, so a group holds its slot for
    # quantum x horizon tokens). Local runtimes have a far smaller
    # dispatch constant and want a shorter horizon — which is why the
    # DEFAULT is 0 = AUTO (r5): the engine measures the runtime's dispatch
    # constant once per process and derives the horizon from it and the
    # model's weight-stream size (utils/dispatch.py; the resolved value is
    # written back into this field at engine build). Remote v5e derives
    # 32 at the measured ~25 ms tunnel constant (8-16 on faster remotes);
    # CPU/local backends derive 1.
    decode_horizon: int = 0
    # scheduling quantum: a decode group keeps its slot for this many engine
    # steps before the round-robin rotates — batches stay stable long enough
    # for prefetched groups to amortize their migration (1 = rotate every
    # step)
    sched_quantum: int = 1
    # Host-streamed serving of sequences whose KV exceeds the HBM pool (or
    # max_seq_len): context attention streams the host tier wave-by-wave
    # (device store backend only). The 128k-context capability of BASELINE
    # config 3.
    stream_enabled: bool = True
    # Max total length of a streamed sequence; None = bounded by the host
    # pool (num_host_blocks - 2 blocks).
    max_stream_seq_len: int | None = None
    # Blocks fetched from the host tier per streamed-attention wave. Each
    # wave is one host-memory gather (a compute_on("device_host") op whose
    # ROUND TRIPS dominate streamed serving on real hardware — measured
    # ~3.1s/dispatch at wave=8 on v5e, NOTES_ROUND3); bigger waves trade a
    # few MB of HBM window for proportionally fewer host ops.
    stream_wave: int = 32
    # Staged-gather budget per streamed lane (MB of HBM). When > 0 and the
    # model's attention windows are uniform, each lane's context KV is
    # gathered in ONE host op per layer GROUP (G layers sized to this
    # budget) into device slabs consumed by the attention wave loop —
    # measured on v5e (scripts/hostop_probe.py) host-op cost is ~5 ms per
    # op nearly independent of bytes, so op count IS the streamed path's
    # wall clock: fewer, fatter gathers. 0 falls back to per-(layer, wave)
    # host fetches. The budget bounds peak staging HBM per lane.
    stream_stage_mb: int = 256
    # Fold each round's migration batch into the decode/prefill program
    # (one dispatch per round). Off by default: the split pipeline — an
    # async standalone migrate program chained into the round's model
    # program by pool dataflow — reaches the same device occupancy with
    # smaller programs, and measures ~2.4x faster per round on
    # remote-dispatch runtimes (480ms fused vs 198ms split per synced
    # round through the axon tunnel).
    fused_rounds: bool = False
    # Concurrent requests with sampling penalties (frequency / presence /
    # repetition). Each penalized request owns one row of a device-resident
    # int32 [penalty_rows + 1, vocab] token-count plane (lazily allocated on
    # the first penalized request; ~0.5 MB/row at Llama-3 vocab). 0 disables
    # the feature. Unpenalized requests never pay for it: the plane only
    # enters the compiled programs once a penalized request has been seen.
    penalty_rows: int = 16
    # Lanes per prefill dispatch. 0 = max_batch_size (the decode width).
    # Prefill lanes don't hold decode slots, so a wider prefill program can
    # chunk MORE queued prompts per dispatch than decode serves — on
    # remote-dispatch runtimes each dispatch costs ~25 ms (round_anatomy),
    # so fewer prefill dispatches is a direct TTFT win. MEASURED TRADEOFF
    # (NOTES_ROUND4): with ample HBM, prefill_lanes=2x batch cut prefill
    # wall time 38%; under tight tiering the same setting REGRESSED the
    # whole bench 38% — the wide wave's working set evicts the decode
    # groups' residency (hit 0.96 -> 0.86). Use only when the HBM pool has
    # headroom beyond ~2x the decode working set. Bounded at dispatch time
    # by the working-set cap; must divide by dp under a mesh.
    prefill_lanes: int = 0
    # Weight storage for the model's matmul weights. "int8" stores every
    # matmul weight (+ the embedding) as int8 with per-output-channel f32
    # scales (W8A16, `ops/wquant.py`): matmuls still run bf16 on the MXU,
    # but the HBM weight stream — which the r4 utilization split shows is
    # what bounds decode (NOTES_ROUND4.md) — halves (measured +27% serving
    # throughput on v5e at +0.03% ppl). "int4" (W4A16) nibble-packs the
    # matmul weights for another 2x (the embedding stays int8 — it is
    # gathered, not streamed); costs more accuracy (+2.1% ppl at random
    # weights), worth it only when the round is still weight-bound after
    # W8A16. NOTE: int4 needs an XLA backend with native S4 arrays — the
    # current remote TPU runtime rejects S4 outright ("Unimplemented",
    # probed in NOTES_ROUND4); CPU and standard TPU backends work.
    # "native" leaves the params as given. Pre-quantized params passed to
    # Engine are respected either way.
    weight_dtype: str = "native"

    def __post_init__(self):
        if self.weight_dtype not in ("native", "int8", "int4"):
            raise ValueError(
                f"weight_dtype must be 'native', 'int8' or 'int4', "
                f"got {self.weight_dtype!r}")


@dataclass
class ParallelConfig:
    """Device-mesh layout. New vs the reference (SURVEY.md section 2.6)."""

    dp: int = 1                         # data parallel (batch) axis
    ep: int = 1                         # expert parallel axis (MoE experts)
    tp: int = 1                         # tensor parallel axis (weights + KV heads)
    axis_names: tuple[str, ...] = ("dp", "ep", "tp")

    @property
    def num_devices(self) -> int:
        return self.dp * self.ep * self.tp


@dataclass
class SystemConfig:
    """Top-level config, analog of `cxl_speckv_system.h:19-39` SystemConfig."""

    cache: CacheConfig = field(default_factory=CacheConfig)
    prefetch: PrefetchConfig = field(default_factory=PrefetchConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    seed: int = 0

    def validate(self) -> None:
        self.cache.validate()

    def replace(self, **kwargs) -> "SystemConfig":
        return dataclasses.replace(self, **kwargs)
