"""Mesh/sharding plan tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from caesar_tpu.engine.kvcache import create_cache
from caesar_tpu.engine.model import get_spec
from caesar_tpu.engine.quant import quantize_params
from caesar_tpu.engine.weights import init_params
from caesar_tpu.parallel.multihost import local_replica_id, make_multihost_mesh
from caesar_tpu.parallel.plan import (
    make_mesh,
    param_shardings,
    shard_cache,
    shard_params,
)

TINY = get_spec("tiny")


def test_make_mesh_and_shard_params():
    mesh = make_mesh(2)
    params = shard_params(TINY, init_params(TINY, seed=0), mesh)
    wq = params["layers"][0]["wq"]
    # column-parallel: out dim split over tp
    assert wq.sharding.spec == P(None, "tp")
    wo = params["layers"][0]["wo"]
    assert wo.sharding.spec == P("tp", None)
    assert params["embed"].sharding.spec == P(None, None)


def test_shard_quantized_params():
    mesh = make_mesh(2)
    qparams = quantize_params(init_params(TINY, seed=0), bits=8, group=32)
    sharded = shard_params(TINY, qparams, mesh)
    wq = sharded["layers"][0]["wq"]
    assert wq.qweight.sharding.spec == P(None, "tp")
    assert wq.scales.sharding.spec == P(None, "tp")
    down = sharded["layers"][0]["mlp"]["down"]
    assert down.qweight.sharding.spec == P("tp", None)


def test_shard_quantized_preserves_act_mode():
    """Round-1 regression: shard_params rebuilt QuantizedLinear without
    `act`, silently degrading w8a8 to weight-only int8 on sharded runs."""
    mesh = make_mesh(2)
    qparams = quantize_params(
        init_params(TINY, seed=0), bits=8, group=32, act="int8"
    )
    sharded = shard_params(TINY, qparams, mesh)
    assert sharded["layers"][0]["wq"].act == "int8"
    assert sharded["layers"][0]["mlp"]["down"].act == "int8"


def test_shard_cache_over_kv_heads():
    mesh = make_mesh(2)
    cache = shard_cache(create_cache(TINY, 8, 16, "bf16"), mesh)
    # head-major pool [L, pages, n_kv, page, hd]: kv heads on axis 2
    assert cache.k_pages.sharding.spec == P(None, None, "tp", None, None)


def test_tp_must_divide_heads():
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="tp=8 must divide"):
        shard_params(TINY, init_params(TINY, seed=0), mesh)  # tiny has 2 kv


def test_param_shardings_tree_matches_params():
    tree = param_shardings(TINY, make_mesh(2))
    params = init_params(TINY, seed=0)
    assert set(tree["layers"][0].keys()) == set(params["layers"][0].keys())


def test_multihost_mesh_axes():
    mesh = make_multihost_mesh(tp=2, dp=4)
    assert mesh.shape == {"dp": 4, "tp": 2}
    assert local_replica_id(mesh) in range(4)


def test_multihost_mesh_insufficient_devices():
    with pytest.raises(ValueError):
        make_multihost_mesh(tp=8, dp=4)
