"""LSTM token predictor.

Real-math port of the reference predictor (`src/prefetcher/lstm_predictor.cpp`
— whose gate math was placeholder, hardcoded 0.5 activations,
`lstm_predictor.cpp:128-146`; and whose load/save were no-ops,
`:96-105`): 2-layer LSTM, 128 hidden, 64-d embedding, history window 16
(`lstm_predictor.cpp:14`), top-k prediction over the vocab, ~real parameter
count (~128K params at vocab 32000 per `lstm_predictor.h:9-11`). Here the
LSTM is actual jit'd JAX, trainable online with optax, and checkpoints
really save/load.

Vocab bucketing: prefetch prediction does not need the LLM's full vocab —
token ids hash into `vocab_buckets` classes (identity when the vocab is
already small). This bounds the output matmul/softmax and the embedding
gradient regardless of model vocab (128k-vocab models made the un-bucketed
logits matmul a ~100ms-per-engine-step CPU cost and a ~36s XLA-CPU train
compile — measured, round 2). The reference predictor has the same
structural issue and its training was a stub; bucketing is the honest fix.

The predictor runs batched on the host CPU device (prediction sits on the
scheduling path; never spend an accelerator dispatch on it — the reference
latency budget is <10us on a dedicated near-memory block,
`hardware/README.md:119-122`).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


class LSTMPredictor:
    def __init__(self, vocab_size: int, *, embed_dim: int = 64, hidden: int = 128,
                 num_layers: int = 2, history_len: int = 16, seed: int = 0,
                 vocab_buckets: int | None = 4096, device=None):
        self.vocab_size = vocab_size
        self.n_classes = min(vocab_size, vocab_buckets or vocab_size)
        self.embed_dim = embed_dim
        self.hidden = hidden
        self.num_layers = num_layers
        self.history_len = history_len
        # The predictor runs on the HOST CPU device by default when the main
        # backend is an accelerator: prediction sits on the scheduling path
        # every engine step. On remote-dispatch runtimes a TPU round trip
        # costs ~10ms — 1000x the reference's latency budget.
        if device is None:
            try:
                if jax.default_backend() != "cpu":
                    device = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                device = None
        self.device = device
        self.params = _init(self.n_classes, embed_dim, hidden, num_layers,
                            jax.random.PRNGKey(seed))
        if device is not None:
            self.params = jax.device_put(self.params, device)
        self._opt_state = None

    def _put(self, x, dtype=jnp.int32):
        a = jnp.asarray(x, dtype)
        return jax.device_put(a, self.device) if self.device is not None else a

    def _bucket(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, np.int32)
        if self.n_classes == self.vocab_size:
            return ids
        return ids % np.int32(self.n_classes)

    @staticmethod
    def _pad_batch(x: np.ndarray) -> tuple[np.ndarray, int]:
        """Pad the batch dim to a power-of-two bucket (min 16) so the jitted
        predictor compiles a handful of shapes instead of one per caller
        batch size — the prediction sits on the scheduling path every engine
        step, and a recompile there costs more than the inference."""
        n = x.shape[0]
        b = 16
        while b < n:
            b *= 2
        if b == n:
            return x, n
        pad = np.zeros((b - n, *x.shape[1:]), x.dtype)
        return np.concatenate([x, pad], axis=0), n

    # -- inference ----------------------------------------------------------

    def predict_top_k(self, histories: np.ndarray, k: int):
        """histories: [B, history_len] int32 (left-padded with 0 — matches
        the reference pad/trim, `lstm_predictor.cpp:44-51`).
        Returns (class_ids [B, k], probs [B, k]) as numpy; class ids are
        bucketed token ids (identity for small vocabs)."""
        h, n = self._pad_batch(self._bucket(histories))
        ids, probs = _top_k(self.params, self._put(h),
                            self.num_layers, self.hidden, k)
        return np.asarray(ids)[:n], np.asarray(probs)[:n]

    def continue_probability(self, histories: np.ndarray, eos_token_id: int):
        """P(next token != eos) per sequence — drives prefetch skip."""
        h, n = self._pad_batch(self._bucket(histories))
        eos = int(eos_token_id) % self.n_classes
        p = _token_prob(self.params, self._put(h),
                        self.num_layers, self.hidden, eos)
        return 1.0 - np.asarray(p)[:n]

    # -- training -----------------------------------------------------------

    def train_batch(self, histories: np.ndarray, targets: np.ndarray,
                    lr: float = 1e-3):
        """One next-token cross-entropy step. Returns the loss as a jax
        scalar — callers on a latency path should NOT block on it (the CPU
        backend executes asynchronously; fetch lazily for stats)."""
        import optax

        if self._opt_state is None:
            self._tx = optax.adamw(lr)
            self._opt_state = self._tx.init(self.params)
        loss, grads = _loss_and_grad(self.params, self._put(self._bucket(histories)),
                                     self._put(self._bucket(targets)),
                                     self.num_layers, self.hidden)
        updates, self._opt_state = self._tx.update(grads, self._opt_state, self.params)
        self.params = optax.apply_updates(self.params, updates)
        return loss

    def warmup(self, batch_sizes=(16, 32), train_batch: int | None = None) -> None:
        """Compile the prediction (and optionally training) programs at their
        serving shapes so no XLA-CPU compile lands mid-serve."""
        T = self.history_len
        for b in batch_sizes:
            h = np.zeros((b, T), np.int32)
            self.continue_probability(h, 0)
        if train_batch:
            hist = np.zeros((train_batch, T), np.int32)
            tgt = np.zeros(train_batch, np.int32)
            params, opt = self.params, self._opt_state
            jax.block_until_ready(self.train_batch(hist, tgt))
            # discard the dummy step's effect
            self.params, self._opt_state = params, opt

    # -- checkpoint (the reference's were stubs; these are real) ------------

    def save(self, path: str) -> None:
        flat = {f"p{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(self.params))}
        np.savez(path, **flat)

    def load(self, path: str) -> None:
        data = np.load(path)
        leaves = [jnp.asarray(data[f"p{i}"]) for i in range(len(data.files))]
        self.params = jax.tree.unflatten(jax.tree.structure(self.params), leaves)

    def model_size_bytes(self) -> int:
        """Analog of `get_model_size` (`lstm_predictor.cpp:107-114`)."""
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(self.params))


def _init(vocab, embed, hidden, layers, key) -> Params:
    ks = jax.random.split(key, 2 + 3 * layers)
    p: Params = {
        "embed": jax.random.normal(ks[0], (vocab, embed)) * 0.02,
        "out": jax.random.normal(ks[1], (hidden, vocab)) * hidden**-0.5,
        "cells": [],
    }
    dim = embed
    for i in range(layers):
        p["cells"].append({
            "wx": jax.random.normal(ks[2 + 3 * i], (dim, 4 * hidden)) * dim**-0.5,
            "wh": jax.random.normal(ks[3 + 3 * i], (hidden, 4 * hidden)) * hidden**-0.5,
            "b": jnp.zeros(4 * hidden),
        })
        dim = hidden
    return p


def _forward(params: Params, histories: jax.Array, num_layers: int, hidden: int):
    """[B, T] -> final-hidden [B, H]."""
    B = histories.shape[0]
    x = params["embed"][histories]  # [B, T, E]

    def run_layer(x, cell):
        def step(carry, xt):
            h, c = carry
            z = xt @ cell["wx"] + h @ cell["wh"] + cell["b"]
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((B, hidden))
        (_, _), hs = jax.lax.scan(step, (h0, h0), x.swapaxes(0, 1))
        return hs.swapaxes(0, 1)  # [B, T, H]

    for cell in params["cells"]:
        x = run_layer(x, cell)
    return x[:, -1]  # final hidden


@functools.partial(jax.jit, static_argnames=("num_layers", "hidden", "k"))
def _top_k(params, histories, num_layers, hidden, k):
    h = _forward(params, histories, num_layers, hidden)
    logits = h @ params["out"]
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, top_i = jax.lax.top_k(probs, k)
    return top_i, top_p


def lstm_pcont(params: Params, hist: jax.Array, fresh_toks: jax.Array,
               eos_class: int) -> jax.Array:
    """In-graph continue probability for `decode_multi` (r5): shift each
    lane's PRE-round bucketed history [B, T] by the round's freshly sampled
    tokens [B, h] (bucketed here) and run the LSTM on the post-round
    window — identical semantics to `continue_probability` called on the
    host after `observe_tokens`. Traced inside the decode program, NOT a
    standalone dispatch (a separate dispatch would cost the very ~10-25 ms
    round trip this exists to avoid)."""
    n_classes = params["embed"].shape[0]
    hidden = params["cells"][0]["wh"].shape[0]
    cat = jnp.concatenate(
        [hist, fresh_toks.astype(jnp.int32) % jnp.int32(n_classes)], axis=1)
    window = cat[:, -hist.shape[1]:]
    h = _forward(params, window, len(params["cells"]), hidden)
    probs = jax.nn.softmax(h @ params["out"], axis=-1)
    return 1.0 - probs[:, eos_class]


@functools.partial(jax.jit, static_argnames=("num_layers", "hidden"))
def _token_prob(params, histories, num_layers, hidden, token_id):
    h = _forward(params, histories, num_layers, hidden)
    probs = jax.nn.softmax(h @ params["out"], axis=-1)
    return probs[:, token_id]


@functools.partial(jax.jit, static_argnames=("num_layers", "hidden"))
def _loss_and_grad(params, histories, targets, num_layers, hidden):
    def loss_fn(p):
        h = _forward(p, histories, num_layers, hidden)
        logits = h @ p["out"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))

    return jax.value_and_grad(loss_fn)(params)
