"""ENet 2D encoder for multiview feature extraction.

Stands in for the reference's torch7-converted ENet
(`lib/visual_grounding/enet.py`, used by
`scripts/multiview_compute/compute_multiview_features.py:90-93` to produce
128-d per-frame feature maps). The reference loads a pretrained
scannetv2_enet.pth (an external asset, like the BERT weights); this flax
implementation follows the published ENet encoder architecture (Paszke et
al. 2016: initial block + 3 encoder stages of bottlenecks) and emits the
same 128-channel feature map at 1/8 resolution that the projection
pipeline consumes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class InitialBlock(nn.Module):
    @nn.compact
    def __call__(self, x, *, train=False):
        conv = nn.Conv(13, (3, 3), strides=2, padding=1)(x)
        pool = nn.max_pool(x, (2, 2), strides=(2, 2))
        y = jnp.concatenate([conv, pool], axis=-1)  # 13 + 3 = 16
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(y)
        return nn.activation.PReLU()(y)


class Bottleneck(nn.Module):
    out_ch: int
    internal_ratio: int = 4
    downsample: bool = False
    dilation: int = 1
    asymmetric: bool = False
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, x, *, train=False):
        inter = self.out_ch // self.internal_ratio
        main = x
        if self.downsample:
            main = nn.max_pool(main, (2, 2), strides=(2, 2))
        if main.shape[-1] != self.out_ch:
            pad = self.out_ch - main.shape[-1]
            main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))

        stride = 2 if self.downsample else 1
        y = nn.Conv(inter, (2, 2) if self.downsample else (1, 1),
                    strides=stride, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(y)
        y = nn.activation.PReLU()(y)
        if self.asymmetric:
            y = nn.Conv(inter, (5, 1), padding=((2, 2), (0, 0)))(y)
            y = nn.Conv(inter, (1, 5), padding=((0, 0), (2, 2)))(y)
        else:
            y = nn.Conv(inter, (3, 3), padding=self.dilation,
                        kernel_dilation=self.dilation)(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(y)
        y = nn.activation.PReLU()(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(y)
        y = nn.Dropout(self.pdrop)(y, deterministic=not train)
        return nn.activation.PReLU()(y + main)


class ENetEncoder(nn.Module):
    """Initial + stage1 (64ch, 1/4) + stage2/3 (128ch, 1/8) -> (H/8, W/8, 128)."""

    @nn.compact
    def __call__(self, images, *, train=False):
        x = InitialBlock()(images, train=train)
        x = Bottleneck(64, downsample=True, pdrop=0.01)(x, train=train)
        for _ in range(4):
            x = Bottleneck(64, pdrop=0.01)(x, train=train)
        x = Bottleneck(128, downsample=True)(x, train=train)
        for dil, asym in [(1, False), (2, False), (1, True), (4, False),
                          (1, False), (8, False), (1, True), (16, False)]:
            x = Bottleneck(128, dilation=dil, asymmetric=asym)(x, train=train)
        return x
