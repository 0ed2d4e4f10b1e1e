"""GMMN generator networks.

Functional parity target: reference zs3/modeling/gmmn.py (class
GMMNnetwork) — an MLP mapping concat(class embedding a_k in R^300, noise
z in R^300) -> a synthetic 256-d pixel feature, trained against real
features with the Gaussian-kernel MMD loss (zs3_tpu.ops.mmd /
zs3_tpu.ops.pallas_mmd).

GraphContextGMMN implements the paper's spatial-context-prior variant
(arXiv:1906.00817 §3.3; BASELINE.json config 5): generation is
additionally conditioned on the bag of neighboring ground-truth regions'
class embeddings, aggregated by a masked-mean graph layer over up to
`max_neighbors` neighbors.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class GMMNGenerator(nn.Module):
    noise_dim: int = 300
    embed_dim: int = 300
    hidden_dim: int = 256
    feature_dim: int = 256
    num_hidden: int = 1
    dropout_rate: float = 0.0
    leaky_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        embedding: jax.Array,
        noise: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """(..., embed_dim), (..., noise_dim) -> (..., feature_dim)."""
        x = jnp.concatenate(
            [embedding.astype(self.dtype), noise.astype(self.dtype)], axis=-1
        )
        for i in range(self.num_hidden):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"hidden{i}")(x)
            x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
            if self.dropout_rate > 0:
                x = nn.Dropout(rate=self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Dense(self.feature_dim, dtype=self.dtype, name="out")(x)
        # Real decoder features are post-ReLU; match their support.
        return nn.relu(x)


class GraphContextGMMN(nn.Module):
    """GMMN conditioned on the neighboring-region class-embedding graph.

    `neighbors` is a fixed-size (..., max_neighbors, embed_dim) stack of
    neighbor class embeddings with a (..., max_neighbors) validity mask —
    the jit-safe encoding of the variable-degree region adjacency graph.
    A linear layer embeds each neighbor, a masked mean aggregates, and
    the context vector concatenates with (embedding, noise).
    """

    noise_dim: int = 300
    embed_dim: int = 300
    hidden_dim: int = 256
    feature_dim: int = 256
    context_dim: int = 256
    num_hidden: int = 1
    dropout_rate: float = 0.0
    leaky_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        embedding: jax.Array,
        noise: jax.Array,
        neighbors: jax.Array,
        neighbor_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        h = nn.Dense(self.context_dim, dtype=self.dtype, name="graph_embed")(
            neighbors.astype(self.dtype)
        )
        h = nn.leaky_relu(h, negative_slope=self.leaky_slope)
        w = neighbor_mask.astype(self.dtype)[..., None]
        denom = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
        context = jnp.sum(h * w, axis=-2) / denom
        x = jnp.concatenate(
            [embedding.astype(self.dtype), noise.astype(self.dtype), context],
            axis=-1,
        )
        for i in range(self.num_hidden):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"hidden{i}")(x)
            x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
            if self.dropout_rate > 0:
                x = nn.Dropout(rate=self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Dense(self.feature_dim, dtype=self.dtype, name="out")(x)
        return nn.relu(x)


def build_gmmn(cfg, dtype=jnp.float32):
    """Build the plain or graph-context generator from a GMMNConfig."""
    common = dict(
        noise_dim=cfg.noise_dim,
        embed_dim=cfg.embed_dim,
        hidden_dim=cfg.hidden_dim,
        feature_dim=cfg.feature_dim,
        num_hidden=cfg.num_hidden,
        dropout_rate=cfg.dropout_rate,
        leaky_slope=cfg.leaky_slope,
        dtype=dtype,
    )
    if cfg.graph_context:
        return GraphContextGMMN(context_dim=cfg.graph_hidden_dim, **common)
    return GMMNGenerator(**common)
