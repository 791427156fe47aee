"""Train the LSTM token predictor on token traces.

The reference ships a predictor whose training never existed (weights were
hardcoded, `lstm_predictor.cpp:128-146`) yet claims 95% top-4 accuracy
(BASELINE.md). This script trains ours for real on next-token prediction
over traces and reports top-k accuracy the same way.

Usage:
    python scripts/train_predictor.py [--vocab 2048] [--steps 300] \
        [--out lstm.npz] [--trace path.npy]

Without --trace, a synthetic Markov-ish trace is generated (structured
enough that top-4 accuracy is meaningfully learnable).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def synthetic_trace(vocab: int, length: int, seed: int = 0) -> np.ndarray:
    """Token stream from a sparse random Markov chain (4 likely successors
    per token — matches the top-4 prediction setting)."""
    rng = np.random.RandomState(seed)
    successors = rng.randint(0, vocab, (vocab, 4))
    probs = np.array([0.55, 0.25, 0.12, 0.08])
    out = np.empty(length, np.int64)
    t = rng.randint(vocab)
    for i in range(length):
        out[i] = t
        if rng.rand() < 0.9:
            t = successors[t, rng.choice(4, p=probs)]
        else:
            t = rng.randint(vocab)
    return out


def windows(trace: np.ndarray, hist: int, n: int, rng) -> tuple[np.ndarray, np.ndarray]:
    idx = rng.randint(0, len(trace) - hist - 1, n)
    H = np.stack([trace[i : i + hist] for i in idx]).astype(np.int32)
    y = trace[idx + hist].astype(np.int32)
    return H, y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hist", type=int, default=16)
    ap.add_argument("--out", default="lstm_predictor.npz")
    ap.add_argument("--trace", default=None, help=".npy int token trace")
    args = ap.parse_args()

    from cxl_speckv_tpu.prefetcher.lstm import LSTMPredictor

    trace = (np.load(args.trace) if args.trace
             else synthetic_trace(args.vocab, 200_000))
    vocab = int(trace.max()) + 1
    pred = LSTMPredictor(vocab, history_len=args.hist)
    rng = np.random.RandomState(1)

    for step in range(args.steps):
        H, y = windows(trace, args.hist, args.batch, rng)
        loss = pred.train_batch(H, y)
        if step % 25 == 0 or step == args.steps - 1:
            Hv, yv = windows(trace, args.hist, 1024, np.random.RandomState(99))
            ids, _ = pred.predict_top_k(Hv, 4)
            top1 = float((ids[:, 0] == yv).mean())
            top4 = float((ids == yv[:, None]).any(axis=1).mean())
            print(f"step {step:4d} loss {loss:.3f} top1 {top1:.3f} top4 {top4:.3f}")

    pred.save(args.out)
    print(f"saved {args.out} ({pred.model_size_bytes() / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
