"""Model parameter checkpointing via Orbax.

Real checkpoint/resume (the reference's `load_model`/`save_model` were no-op
stubs, `lstm_predictor.cpp:96-105`): saves/restores the full parameter
pytree; the predictor has its own lightweight npz path
(`prefetcher/lstm.py`).
"""

from __future__ import annotations

from pathlib import Path


def save_params(params, path: str) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).resolve(), params, force=True)


def load_params(path: str, like=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            import jax

            target = jax.tree.map(
                lambda x: ocp.utils.to_shape_dtype_struct(x), like)
            return ckptr.restore(Path(path).resolve(), target)
        return ckptr.restore(Path(path).resolve())
