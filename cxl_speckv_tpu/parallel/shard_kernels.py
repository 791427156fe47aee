"""shard_map wrappers that make the Pallas attention kernels legal under a
device mesh (VERDICT r2 item 1: mesh serving must run the flagship kernels,
not fall back to the jnp reference attention).

The KV pools are kv-head-sharded over "tp" (`parallel/sharding.py:pool_specs`;
the transposed K pool shards its head-major COLUMN axis, which is the same
per-head decomposition)
and batch lanes over "dp", so paged attention decomposes with ZERO cross-chip
communication: q heads are laid out kv-head-major (q head h*G+g belongs to kv
head h), so sharding the q-head axis over "tp" hands each chip exactly the
query heads of its resident kv heads, and every (lane, kv-head) attention
reduction is chip-local. `jax.shard_map` pins that decomposition: each shard
runs the unmodified single-chip Pallas kernel on its [B/dp, Hkv/tp] slice —
the same program the single-chip engine runs, so mesh serving and single-chip
serving share one attention implementation and one rounding behavior.

Mesh axes follow `parallel/mesh.make_mesh` ("dp", "ep", "tp"); axes a spec
does not mention are replicated (the pools don't use "ep" — MoE expert
sharding never touches KV). Inputs whose batch axis does not divide "dp"
(e.g. the single-lane draft prefill) fall back to batch-replicated specs:
every dp group computes the same slice, which GSPMD folds away.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P


def _batch_axis(mesh: Mesh, b: int):
    """"dp" when the batch divides it, else None (replicated lanes)."""
    return "dp" if b % mesh.shape["dp"] == 0 else None


def sharded_paged_attention(mesh: Mesh, *, compute_dtype):
    """Mesh-legal `ops.paged_attention.paged_attention` (decode kernel)."""
    from cxl_speckv_tpu.ops.paged_attention import paged_attention

    def attend(q, k_pool, v_pool, k_scale, v_scale, block_table, seq_lens,
               kv_dtype, *, scheme_id=None, window=None, sm_scale=None,
               softcap=None, sinks=None):
        bax = _batch_axis(mesh, q.shape[0])
        args = [q, k_pool, v_pool, k_scale, v_scale, block_table, seq_lens]
        in_specs = [
            P(bax, "tp", None),            # q [B, Hq, D]
            P(None, None, "tp"),           # k_pool [S, Dp, Hkv*bs] (kT)
            P(None, "tp", None, None),     # v_pool [S, Hkv, bs, Dp]
            P(None, None, "tp"),           # k_scale [S, 1, Hkv*bs] (flat)
            P(None, None, "tp"),           # v_scale
            P(bax, None),                  # block_table [B, mb]
            P(bax),                        # seq_lens [B]
        ]
        has_sid = scheme_id is not None
        has_sinks = sinks is not None
        if has_sid:
            args.append(scheme_id)
            in_specs.append(P())           # per-layer scheme id (replicated)
        if has_sinks:
            args.append(sinks)
            in_specs.append(P("tp"))       # [Hq] learned sink logits

        def body(q, kp, vp, ks, vs, table, lens, *rest):
            rest = list(rest)
            sid = rest.pop(0) if has_sid else None
            snk = rest.pop(0) if has_sinks else None
            return paged_attention(
                q, kp, vp, ks, vs, table, lens, kv_dtype,
                scheme_id=sid, window=window, sm_scale=sm_scale,
                softcap=softcap, sinks=snk, compute_dtype=compute_dtype)

        return jax.shard_map(
            body, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=P(bax, "tp", None), check_vma=False)(*args)

    return attend


def sharded_chunk_attention(mesh: Mesh, *, compute_dtype):
    """Mesh-legal `ops.chunk_attention_pallas.paged_chunk_attention_pallas`
    (prefill / speculative-verify kernel)."""
    from cxl_speckv_tpu.ops.chunk_attention_pallas import (
        paged_chunk_attention_pallas)

    def attend_chunk(q, k_new, v_new, k_pool, v_pool, k_scale, v_scale,
                     block_table, start_pos, kv_dtype, *, scheme_id=None,
                     window=None, sm_scale=None, softcap=None, sinks=None):
        bax = _batch_axis(mesh, q.shape[0])
        args = [q, k_new, v_new, k_pool, v_pool, k_scale, v_scale,
                block_table, start_pos]
        in_specs = [
            P(bax, None, "tp", None),      # q [B, T, Hq, D]
            P(bax, None, "tp", None),      # k_new [B, T, Hkv, D]
            P(bax, None, "tp", None),      # v_new
            P(None, None, "tp"),           # k_pool [S, Dp, Hkv*bs] (kT)
            P(None, "tp", None, None),     # v_pool [S, Hkv, bs, Dp]
            P(None, None, "tp"),           # k_scale [S, 1, Hkv*bs] (flat)
            P(None, None, "tp"),           # v_scale
            P(bax, None),                  # block_table [B, mb]
            P(bax),                        # start_pos [B]
        ]
        has_sid = scheme_id is not None
        has_sinks = sinks is not None
        if has_sid:
            args.append(scheme_id)
            in_specs.append(P())
        if has_sinks:
            args.append(sinks)
            in_specs.append(P("tp"))

        def body(q, kn, vn, kp, vp, ks, vs, table, start, *rest):
            rest = list(rest)
            sid = rest.pop(0) if has_sid else None
            snk = rest.pop(0) if has_sinks else None
            return paged_chunk_attention_pallas(
                q, kn, vn, kp, vp, ks, vs, table, start, kv_dtype,
                scheme_id=sid, window=window, sm_scale=sm_scale,
                softcap=softcap, sinks=snk, compute_dtype=compute_dtype)

        return jax.shard_map(
            body, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=P(bax, None, "tp", None), check_vma=False)(*args)

    return attend_chunk
