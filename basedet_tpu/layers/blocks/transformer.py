"""DETR transformer (flax.linen).

Capability analogue of /root/reference/basedet/layers/blocks/transformer.py:21-483
(from-scratch Attention with additive mask, pre/post-norm encoder/decoder
layers, intermediate-output decoder stack, NCHW-flatten Transformer wrapper)
and position_embedding.py:8-80 (sine + learned). Implemented with
flax MultiHeadDotProductAttention; sequences are (B, L, D); key padding
masks are (B, L) booleans (True = PADDING, matching the reference's mask
semantics).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from basedet_tpu.parallel.tp import tp_shard


class MLP(nn.Module):
    """Simple FFN head (reference layers/blocks/mlp.py:9)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden_dim, name=f"layer{i}")(x))
        return nn.Dense(self.out_dim, name=f"layer{self.num_layers - 1}")(x)


def sine_position_embedding(
    mask: jnp.ndarray, num_pos_feats: int = 128, temperature: int = 10000
) -> jnp.ndarray:
    """mask: (B, H, W) True=padding → (B, H, W, 2·num_pos_feats) sine embed
    (reference position_embedding.py sine variant)."""
    not_mask = 1.0 - mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class LearnedPositionEmbedding(nn.Module):
    num_pos_feats: int = 128
    max_size: int = 50

    @nn.compact
    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        B, H, W = mask.shape
        row = self.param(
            "row_embed", nn.initializers.uniform(1.0),
            (self.max_size, self.num_pos_feats),
        )
        col = self.param(
            "col_embed", nn.initializers.uniform(1.0),
            (self.max_size, self.num_pos_feats),
        )
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(col[None, :W, :], (H, W, self.num_pos_feats)),
                jnp.broadcast_to(row[:H, None, :], (H, W, self.num_pos_feats)),
            ],
            axis=-1,
        )
        return jnp.broadcast_to(pos[None], (B, H, W, 2 * self.num_pos_feats))


def _attn_mask_from_padding(key_padding: Optional[jnp.ndarray], q_len: int):
    """(B, Lk) True=pad → (B, 1, Lq, Lk) boolean attention mask
    (True = attend) for flax MHA."""
    if key_padding is None:
        return None
    attend = ~key_padding.astype(bool)
    return jnp.broadcast_to(
        attend[:, None, None, :],
        (key_padding.shape[0], 1, q_len, key_padding.shape[1]),
    )


class EncoderLayer(nn.Module):
    dim: int
    num_heads: int = 8
    dim_ffn: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, src, pos, key_padding):
        def sa(x):
            q = x + pos
            return nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                dropout_rate=self.dropout,
                deterministic=not self.train,
                name="self_attn",
            )(q, q, x, mask=_attn_mask_from_padding(key_padding, x.shape[1]))

        def ffn(x):
            y = nn.Dense(self.dim_ffn, name="linear1")(x)
            # TP: hidden dim split over the "model" axis — GSPMD turns the
            # two Dense matmuls into column/row-parallel halves (no-op on
            # DP-only meshes)
            y = tp_shard(y, ("data", None, "model"))
            y = jax.nn.relu(y)
            y = nn.Dropout(self.dropout, deterministic=not self.train)(y)
            return nn.Dense(self.dim, name="linear2")(y)

        drop = lambda x: nn.Dropout(self.dropout, deterministic=not self.train)(x)
        if self.normalize_before:
            src = src + drop(sa(nn.LayerNorm(name="norm1")(src)))
            src = src + drop(ffn(nn.LayerNorm(name="norm2")(src)))
        else:
            src = nn.LayerNorm(name="norm1")(src + drop(sa(src)))
            src = nn.LayerNorm(name="norm2")(src + drop(ffn(src)))
        return src


class DecoderLayer(nn.Module):
    dim: int
    num_heads: int = 8
    dim_ffn: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, key_padding):
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not self.train)(x)

        def sa(x):
            q = x + query_pos
            return nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dropout_rate=self.dropout,
                deterministic=not self.train, name="self_attn",
            )(q, q, x)

        def ca(x):
            return nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dropout_rate=self.dropout,
                deterministic=not self.train, name="cross_attn",
            )(
                x + query_pos,
                memory + pos,
                memory,
                mask=_attn_mask_from_padding(key_padding, x.shape[1]),
            )

        def ffn(x):
            y = nn.Dense(self.dim_ffn, name="linear1")(x)
            y = tp_shard(y, ("data", None, "model"))
            y = jax.nn.relu(y)
            y = nn.Dropout(self.dropout, deterministic=not self.train)(y)
            return nn.Dense(self.dim, name="linear2")(y)

        if self.normalize_before:
            tgt = tgt + drop(sa(nn.LayerNorm(name="norm1")(tgt)))
            tgt = tgt + drop(ca(nn.LayerNorm(name="norm2")(tgt)))
            tgt = tgt + drop(ffn(nn.LayerNorm(name="norm3")(tgt)))
        else:
            tgt = nn.LayerNorm(name="norm1")(tgt + drop(sa(tgt)))
            tgt = nn.LayerNorm(name="norm2")(tgt + drop(ca(tgt)))
            tgt = nn.LayerNorm(name="norm3")(tgt + drop(ffn(tgt)))
        return tgt


class Transformer(nn.Module):
    """NHWC-flatten encoder/decoder with intermediate decoder outputs
    (reference transformer.py:420-483)."""

    dim: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_ffn: int = 2048
    dropout: float = 0.1
    normalize_before: bool = False
    return_intermediate_dec: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, src, mask, query_embed, pos):
        """src (B, H, W, D); mask (B, H, W) True=pad; query_embed (Q, D);
        pos (B, H, W, D). Returns hs (L, B, Q, D)."""
        B, H, W, D = src.shape
        src = src.reshape(B, H * W, D)
        pos = pos.reshape(B, H * W, D)
        key_padding = mask.reshape(B, H * W)

        x = src
        for i in range(self.num_encoder_layers):
            x = EncoderLayer(
                self.dim, self.num_heads, self.dim_ffn, self.dropout,
                self.normalize_before, self.train, name=f"encoder_{i}",
            )(x, pos, key_padding)
        if self.normalize_before:
            x = nn.LayerNorm(name="encoder_norm")(x)
        memory = x

        Q = query_embed.shape[0]
        query_pos = jnp.broadcast_to(query_embed[None], (B, Q, D))
        tgt = jnp.zeros((B, Q, D), src.dtype)
        decoder_norm = nn.LayerNorm(name="decoder_norm")
        intermediate = []
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer(
                self.dim, self.num_heads, self.dim_ffn, self.dropout,
                self.normalize_before, self.train, name=f"decoder_{i}",
            )(tgt, memory, pos, query_pos, key_padding)
            intermediate.append(decoder_norm(tgt))
        if self.return_intermediate_dec:
            return jnp.stack(intermediate, axis=0), memory
        return intermediate[-1][None], memory
