"""Cross-replica BatchNorm under shard_map (the SyncBN replacement).

Two independent guarantees:
  1. under jit with a sharded batch, plain BN already sees the global
     batch (tested in test_sharding.py);
  2. under shard_map — where each program only sees its shard —
     BatchNorm(axis_name="data") pmeans the statistics, reproducing
     global-batch results exactly.  This is the path the reference's
     430-line SyncBN existed for.
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from zs3_tpu.models.layers import BatchNorm


def test_axis_name_bn_matches_global_batch(mesh8, rng):
    x = rng.standard_normal((16, 6, 6, 4)).astype(np.float32)

    bn_sync = BatchNorm(axis_name="data")
    bn_plain = BatchNorm()
    variables = bn_plain.init(jax.random.key(0), jnp.asarray(x), train=False)

    # global-batch reference on one device
    ref_out, ref_upd = bn_plain.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )

    # shard_map: each program normalizes its 2-sample shard but pmeans
    # the statistics across the axis
    def per_shard(v, xs):
        out, upd = bn_sync.apply(v, xs, train=True, mutable=["batch_stats"])
        return out, upd["batch_stats"]

    sharded = shard_map(
        per_shard,
        mesh=mesh8,
        in_specs=(P(), P("data")),
        out_specs=(P("data"), P()),
        
    )
    out, stats = sharded(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    for a, b in zip(
        jax.tree.leaves(stats), jax.tree.leaves(ref_upd["batch_stats"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_without_axis_name_shards_diverge(mesh8, rng):
    """Sanity: plain BN under shard_map normalizes per shard — different
    from the global result (this is exactly the bug SyncBN fixes)."""
    x = rng.standard_normal((16, 6, 6, 4)).astype(np.float32)
    x[:8] += 10.0  # make shard statistics very different
    bn_plain = BatchNorm()
    variables = bn_plain.init(jax.random.key(0), jnp.asarray(x), train=False)
    ref_out, _ = bn_plain.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )

    def per_shard(v, xs):
        out, _ = bn_plain.apply(v, xs, train=True, mutable=["batch_stats"])
        return out

    out = shard_map(
        per_shard, mesh=mesh8, in_specs=(P(), P("data")), out_specs=P("data"),
        
    )(variables, jnp.asarray(x))
    assert not np.allclose(np.asarray(out), np.asarray(ref_out), atol=1e-3)
