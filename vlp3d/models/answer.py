"""VQA answer head: attention-flatten over cross-modal features + classifier.

Port of `models/answer_module/answer_module.py:10-114` (the live path is
just AttFlat over cross_box_feature -> answer_cls, :110-113) with AttFlat
from `models/vqa/mcan_module.py:74-109` (hidden 128, flat_mlp 512,
glimpses 1, flat_out 512, dropout 0.1).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class AttFlat(nn.Module):
    hidden_size: int = 128
    flat_mlp_size: int = 512
    flat_glimpses: int = 1
    flat_out_size: int = 512
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, x, x_mask=None, *, train: bool = False):
        """x: (N, K, H) -> (N, flat_out_size)."""
        att = nn.Dense(self.flat_mlp_size)(x)
        att = nn.gelu(att)
        att = nn.Dropout(self.pdrop)(att, deterministic=not train)
        att = nn.Dense(self.flat_glimpses)(att)  # (N, K, G)
        if x_mask is not None:
            att = jnp.where(x_mask[..., None], -1e9, att)
        att = jax.nn.softmax(att, axis=1)
        flat = jnp.einsum("nkg,nkh->ngh", att, x).reshape(
            x.shape[0], self.flat_glimpses * self.hidden_size
        )
        return nn.Dense(self.flat_out_size, name="linear_merge")(flat)


class AnswerModule(nn.Module):
    num_answers: int = 8192
    hidden_size: int = 128
    flat_out_size: int = 512

    @nn.compact
    def __call__(self, cross_box_feature: jax.Array, *, train: bool = False):
        """cross_box_feature: (B*L, K, H) -> answer_scores (B*L, num_answers)."""
        fuse = AttFlat(
            self.hidden_size,
            flat_out_size=self.flat_out_size,
            name="attflat_visual",
        )(cross_box_feature, train=train)
        x = nn.Dense(self.hidden_size)(fuse)
        x = nn.gelu(x)
        x = nn.Dropout(0.1)(x, deterministic=not train)
        return nn.Dense(self.num_answers)(x)
