"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.models.configs import LlamaConfig
from cxl_speckv_tpu.models.llama import decode_step, forward_dense, init_params
from cxl_speckv_tpu.ops.quant import kv_storage_dtype
from cxl_speckv_tpu.parallel.mesh import make_mesh
from cxl_speckv_tpu.parallel.sharding import (
    param_shardings,
    shard_params,
    shard_pools,
    validate_tp,
)

# tiny config with enough heads for tp=4
CFG = LlamaConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
    num_q_heads=8, num_kv_heads=4, head_dim=16, rope_theta=10000.0,
    tie_embeddings=False, max_seq_len=256, eos_token_id=0, dtype="float32",
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(dp=2, tp=4)


def test_validate_tp():
    validate_tp(CFG, 4)
    with pytest.raises(ValueError):
        validate_tp(CFG, 3)


def test_param_sharding_tree_matches(mesh):
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    sh = param_shardings(CFG, mesh)
    assert jax.tree.structure(params) == jax.tree.structure(sh)
    sharded = shard_params(params, CFG, mesh)
    q = sharded["layers"]["q"]
    # q [L, H, Hq*D] sharded on last axis over tp=4
    assert q.sharding.spec == jax.sharding.PartitionSpec(None, None, "tp")
    shard_shape = q.addressable_shards[0].data.shape
    assert shard_shape[-1] == q.shape[-1] // 4


def test_sharded_forward_matches_single_device(mesh):
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, CFG.vocab_size)
    want = np.asarray(forward_dense(params, CFG, toks))
    sharded = shard_params(params, CFG, mesh)
    with jax.set_mesh(mesh):
        got = np.asarray(forward_dense(sharded, CFG, toks))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sharded_decode_step_matches(mesh):
    kv_dtype = KVDtype.INT8
    params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    B, S, bs, MB = 4, 17, 8, 4
    pack = 1
    def make_pools():
        kp = jnp.zeros((CFG.num_layers, S, CFG.head_dim // pack,
                        CFG.num_kv_heads * bs), kv_storage_dtype(kv_dtype))
        vp = jnp.zeros((CFG.num_layers, S, CFG.num_kv_heads, bs,
                        CFG.head_dim // pack), kv_storage_dtype(kv_dtype))
        sc = jnp.ones((CFG.num_layers, S, 1,
                       CFG.num_kv_heads * bs), jnp.float32)
        return (kp, vp, sc, jnp.ones_like(sc))

    table = jnp.arange(B * MB, dtype=jnp.int32).reshape(B, MB) % (S - 1)
    tokens = jnp.array([3, 5, 7, 9], jnp.int32)
    positions = jnp.zeros(B, jnp.int32)
    lens = jnp.ones(B, jnp.int32)

    # decode_step donates its pools — build a fresh set for each call
    want_logits, *want_pools = decode_step(
        params, CFG, kv_dtype, tokens, positions, *make_pools(), table, lens)

    sh_params = shard_params(params, CFG, mesh)
    sh_pools = shard_pools(make_pools(), mesh)
    with jax.set_mesh(mesh):
        got_logits, *got_pools = decode_step(
            sh_params, CFG, kv_dtype, tokens, positions, *sh_pools, table, lens)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(want_logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got_pools[0]), np.asarray(want_pools[0]))
