"""Weight-only INT8 quantization of the model's matmul weights (W8A16).

Why: the r4 utilization measurements (NOTES_ROUND4.md) show the decode loop
is WEIGHT-bound at serving batch sizes — 39.5 GB of weight streaming vs
0.1 GB of KV per fused round at the bench geometry, with effective HBM
bandwidth at 44-48% of the v5e datasheet. Halving the weight byte stream is
therefore the single largest wall-clock lever left on the decode path.

TPU-native shape: weights live in HBM as int8 with per-output-channel f32
scales; the matmul itself runs bf16 on the MXU with the int8->bf16 convert
fused into the operand load by XLA (the HBM read is 1 byte/element), and
the scale multiplies the matmul RESULT:

    (x @ q) * s  ==  x @ (q * s)        exactly, when s is per-out-column

so no dequantized weight copy is ever materialized in HBM. The embedding
table quantizes per-ROW (per vocab entry) so the same storage serves both
the gather (dequant the gathered rows) and — transposed — the tied lm_head
matmul (where per-row becomes per-out-column).

Reference analog: the reference compresses only the KV stream
(`/root/reference/hardware/rtl/kv_compress.v:5-203`, fixed-ratio INT8 to
make the slow tier cheaper to stream). This module applies the identical
fixed-ratio idea to the WEIGHT stream, which on TPU decode is the dominant
HBM traffic. Orthogonal to, and composable with, the KV-cache quantization
in `ops/quant.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantizedTensor:
    """An int8 weight with a broadcastable per-channel scale.

    q: int8, the original weight's shape.
    s: float32, same rank with `axis` reduced to size 1 (so `q * s`
       dequantizes by broadcasting).
    axis: the reduced axis, normalized negative. For matmul weights
       [..., in, out] this is -2 (per-output-channel); for the embedding
       table [V, H] it is -1 (per-row).

    Registered as a pytree NODE (not a leaf): jit/scan/shard_map/tree.map
    all see (q, s) as ordinary leaves, so layer stacking, scan slicing and
    pipeline-stage regrouping work untouched — both arrays share every
    leading batch/layer axis by construction.
    """

    __slots__ = ("q", "s", "axis")

    def __init__(self, q, s, axis: int):
        self.q = q
        self.s = s
        self.axis = axis

    # --- array-ish surface used by the model code -------------------------
    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def size(self):
        return self.q.size

    @property
    def dtype(self):
        return self.q.dtype

    @property
    def T(self):
        """2-D transpose. Per-row embed [V, H] transposes to a standard
        per-out-column head weight [H, V] (this is what makes one quantized
        embedding serve both the gather and the tied lm_head)."""
        if self.q.ndim != 2:
            raise ValueError("QuantizedTensor.T is 2-D only")
        return QuantizedTensor(self.q.T, self.s.T, -3 - self.axis)  # -1<->-2

    def __getitem__(self, idx):
        """Leading-axis indexing (scan/tree.map layer slicing uses tree.map,
        but explicit lp[...] code paths may index); only valid while the
        scale axis is untouched (leading axes)."""
        return QuantizedTensor(self.q[idx], self.s[idx], self.axis)

    def dequantize(self, dtype=jnp.float32):
        return (self.q.astype(jnp.float32) * self.s).astype(dtype)

    # --- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.q, self.s), self.axis

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    def __repr__(self):
        return (f"QuantizedTensor(q={getattr(self.q, 'shape', self.q)}, "
                f"s={getattr(self.s, 'shape', self.s)}, axis={self.axis})")


def quantize_tensor(w: jax.Array, axis: int = -2,
                    bits: int = 8) -> QuantizedTensor:
    """Symmetric per-channel intN: s = amax/qmax over `axis`, q = round(w/s).

    bits=8 stores jnp.int8; bits=4 stores jnp.int4 (XLA packs two values
    per HBM byte on TPU — the jax-level `nbytes` reports unpacked, but the
    on-device weight stream is nibble-packed, which is the point)."""
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    qmax = 127 if bits == 8 else 7
    dt = jnp.int8 if bits == 8 else jnp.int4
    axis = axis if axis < 0 else axis - w.ndim
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / qmax
    q = jnp.clip(jnp.round(wf / s), -qmax, qmax).astype(dt)
    return QuantizedTensor(q, s, axis)


# matmul weights quantize per-output-channel (axis=-2 is the contracting
# input axis); these are the layer-dict keys that are matmul weights
_LAYER_MM_KEYS = frozenset({
    "q", "k", "v", "o", "gate", "up", "down",
    "shared_gate", "shared_up", "shared_down",
})
# kept in full precision: router (tiny, routing math is f32 and exactness
# matters for top-k ties), norms, biases, sinks, scalar gates
_SKIP_LAYER_KEYS = frozenset({
    "router", "router_bias", "shared_expert_gate", "sinks",
})


def quantize_weights(params, bits: int = 8):
    """Quantize a `models.llama.init_params`-layout tree to W8A16/W4A16.

    Every dense + expert matmul weight (and lm_head) becomes a
    QuantizedTensor; norms, biases, and the MoE router stay as-is.
    The EMBEDDING stays int8 even at bits=4: the table is read by gather
    (one row per token, not a stream) and tied-head logits are the last
    projection before sampling — int4 there costs accuracy for no
    measurable bandwidth (the lm_head matmul is 1 of 7L+1 matmuls).
    Idempotent on already-quantized leaves.
    """
    assert not (_LAYER_MM_KEYS & _SKIP_LAYER_KEYS), (
        "a layer key cannot be both quantized and skipped")
    out = dict(params)
    if not isinstance(params.get("embed"), QuantizedTensor):
        out["embed"] = quantize_tensor(params["embed"], axis=-1,
                                       bits=8)  # per-row
    layers = dict(params["layers"])
    for k, w in layers.items():
        if k in _LAYER_MM_KEYS and not isinstance(w, QuantizedTensor):
            layers[k] = quantize_tensor(w, axis=-2, bits=bits)
        elif (k not in _SKIP_LAYER_KEYS and w.ndim >= 3
              and not k.endswith(("_norm", "_bias"))
              and not isinstance(w, QuantizedTensor)):
            # a >=3-D layer leaf that is neither a known matmul weight nor
            # a known-skipped key would silently stream full-precision —
            # surface the drift instead (new layer keys must be classified
            # into _LAYER_MM_KEYS or _SKIP_LAYER_KEYS)
            raise ValueError(
                f"unclassified layer weight {k!r} (shape {w.shape}): add it "
                "to _LAYER_MM_KEYS or _SKIP_LAYER_KEYS")
    out["layers"] = layers
    if "lm_head" in params and not isinstance(params["lm_head"],
                                              QuantizedTensor):
        out["lm_head"] = quantize_tensor(params["lm_head"], axis=-2, bits=bits)
    return out


def is_quantized(params) -> bool:
    return isinstance(params.get("embed"), QuantizedTensor)


# ---------------------------------------------------------------------------
# compute chokepoints (each accepts plain arrays too, so every model path
# stays a single code path)
# ---------------------------------------------------------------------------

def mm(x: jax.Array, w) -> jax.Array:
    """x @ w for a plain array or a per-out-column QuantizedTensor.

    The int8 operand converts to x.dtype inside the matmul fusion (int8 HBM
    reads); the scale folds into the epilogue as a [.., 1, out] broadcast
    against the result.
    """
    if isinstance(w, QuantizedTensor):
        if w.axis != -2:
            raise ValueError(f"mm needs per-out-column scales, axis={w.axis}")
        y = x @ w.q.astype(x.dtype)
        # scale [..., 1, out] broadcasts against the result's [..., t, out]
        # (incl. leading-batch weights, where both share the batch axes);
        # only a rank-0-result edge needs the reduced axis dropped
        s = w.s.astype(x.dtype)
        if y.ndim < s.ndim:
            s = jnp.squeeze(s, -2)
        return y * s
    return x @ w


def qeinsum(spec: str, x: jax.Array, w) -> jax.Array:
    """einsum(spec, x, w) where w may be quantized. Contract: the einsum
    contracts exactly w's scale axis, and w's kept axes appear in the
    result where `w.s` (with its reduced axis squeezed... kept at size 1)
    broadcasts against it — true for the MoE expert einsums
    ("ech,ehi->eci", "eci,eih->ech") where the kept [E, out] axes line up
    as [E, 1, out] against an [E, C, out] result."""
    if isinstance(w, QuantizedTensor):
        y = jnp.einsum(spec, x, w.q.astype(x.dtype))
        return y * jnp.squeeze(w.s, w.axis).astype(x.dtype)[..., None, :]
    return jnp.einsum(spec, x, w)


def take_rows(w, ids: jax.Array, dtype=None) -> jax.Array:
    """Embedding gather: w[ids] with per-row dequantization when quantized.

    Plain arrays gather UNCAST (they keep the param's own dtype, which is
    what sets the activation dtype for the whole forward — HF-parity runs
    f32 params under bf16 configs); `dtype` only names the dequantization
    target for the quantized branch, where there is no storage dtype to
    inherit (int8 is not an activation type).
    """
    if isinstance(w, QuantizedTensor):
        if w.axis != -1:
            raise ValueError("take_rows needs per-row scales (axis=-1)")
        dt = dtype or jnp.bfloat16
        return w.q[ids].astype(dt) * w.s[ids].astype(dt)
    return w[ids]


def act_dtype(w, config_dtype):
    """The activation dtype a forward seeded from embedding `w` will carry:
    the param's own dtype when plain, the config compute dtype when the
    storage is quantized."""
    if isinstance(w, QuantizedTensor):
        return jnp.dtype(config_dtype)
    return w.dtype


# ---------------------------------------------------------------------------
# sharding integration: PartitionSpec trees gain matching QT nodes
# ---------------------------------------------------------------------------

def _scale_spec(spec, ndim: int, axis: int):
    from jax.sharding import PartitionSpec as P
    entries = list(tuple(spec)) + [None] * (ndim - len(tuple(spec)))
    entries[axis + ndim if axis < 0 else axis] = None
    return P(*entries)


def quantize_specs(specs, params):
    """Rewrite a `param_specs` tree so its structure matches a quantized
    params tree: wherever params holds a QuantizedTensor, the flat spec
    becomes a QT node of (q_spec, s_spec) — s keeps the weight's spec with
    the reduced axis unsharded (it is size 1 there)."""
    def one(p, spec):
        if isinstance(p, QuantizedTensor):
            return QuantizedTensor(spec, _scale_spec(spec, p.ndim, p.axis),
                                   p.axis)
        return spec

    return jax.tree.map(one, params, specs,
                        is_leaf=lambda x: isinstance(x, QuantizedTensor))
