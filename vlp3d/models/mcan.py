"""MCAN (Modular Co-Attention Network) fusion blocks for the ScanQA path.

Port of `models/vqa/mcan_module.py`: MHAtt (post-LN residual attention),
SA (self-attention) encoder over language, SGA (self + guided attention)
decoder over object proposals, MCAN_ED encoder-decoder (hidden 128,
heads 8; ScanQA uses num_layers=2, qa_module.py:22, 83).
Masks are True where positions should be suppressed (mcan_module.py's
masked_fill convention). LayerNorms use the reference's torch-std
variant (RefLayerNorm) for exact parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.models.layers import RefLayerNorm


class MHAtt(nn.Module):
    hidden_size: int = 128
    num_heads: int = 8
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, v, k, q, mask=None, *, deterministic=True):
        b = q.shape[0]
        h, dh = self.num_heads, self.hidden_size // self.num_heads
        v = nn.Dense(self.hidden_size, name="linear_v")(v)
        k = nn.Dense(self.hidden_size, name="linear_k")(k)
        q = nn.Dense(self.hidden_size, name="linear_q")(q)
        v = v.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
        q = q.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(dh)
        )
        if mask is not None:
            att = jnp.where(mask[:, None, None, :], -1e9, att)
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.pdrop)(att, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.hidden_size)
        return nn.Dense(self.hidden_size, name="linear_merge")(out)


class FFN(nn.Module):
    hidden_size: int = 128
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        y = nn.Dense(self.hidden_size * 4)(x)
        y = nn.gelu(y)
        y = nn.Dropout(self.pdrop)(y, deterministic=deterministic)
        return nn.Dense(self.hidden_size)(y)


class SA(nn.Module):
    hidden_size: int = 128
    num_heads: int = 8
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, x, x_mask=None, *, deterministic=True):
        y = MHAtt(self.hidden_size, self.num_heads, self.pdrop)(
            x, x, x, x_mask, deterministic=deterministic
        )
        x = RefLayerNorm()(
            x + nn.Dropout(self.pdrop)(y, deterministic=deterministic)
        )
        y = FFN(self.hidden_size, self.pdrop)(x, deterministic=deterministic)
        return RefLayerNorm()(
            x + nn.Dropout(self.pdrop)(y, deterministic=deterministic)
        )


class SGA(nn.Module):
    hidden_size: int = 128
    num_heads: int = 8
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, x, y, x_mask=None, y_mask=None, *, deterministic=True):
        z = MHAtt(self.hidden_size, self.num_heads, self.pdrop)(
            x, x, x, x_mask, deterministic=deterministic
        )
        x = RefLayerNorm()(
            x + nn.Dropout(self.pdrop)(z, deterministic=deterministic)
        )
        z = MHAtt(self.hidden_size, self.num_heads, self.pdrop)(
            y, y, x, y_mask, deterministic=deterministic
        )
        x = RefLayerNorm()(
            x + nn.Dropout(self.pdrop)(z, deterministic=deterministic)
        )
        z = FFN(self.hidden_size, self.pdrop)(x, deterministic=deterministic)
        return RefLayerNorm()(
            x + nn.Dropout(self.pdrop)(z, deterministic=deterministic)
        )


class MCAN_ED(nn.Module):
    hidden_size: int = 128
    num_heads: int = 8
    num_layers: int = 2
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, lang, objects, lang_mask=None, obj_mask=None, *,
                 deterministic=True):
        for i in range(self.num_layers):
            lang = SA(
                self.hidden_size, self.num_heads, self.pdrop,
                name=f"enc_{i}",
            )(lang, lang_mask, deterministic=deterministic)
        for i in range(self.num_layers):
            objects = SGA(
                self.hidden_size, self.num_heads, self.pdrop,
                name=f"dec_{i}",
            )(objects, lang, obj_mask, lang_mask,
              deterministic=deterministic)
        return lang, objects
