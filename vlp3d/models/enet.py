"""ENet 2D encoder for multiview feature extraction — exact mirror of the
reference's torch7-converted graph.

The reference (`lib/visual_grounding/enet.py:130-695`, consumed by
`scripts/multiview_compute/compute_multiview_features.py:88-99`) is a
torch7 dump with several quirks that matter for loading the pretrained
`scannetv2_enet.pth` asset and reproducing its activations:

  * per-channel PReLU everywhere (torch nn.PReLU(C));
  * a custom Dropout2d that multiplies by (1-p) BEFORE standard dropout
    (enet.py:88-95) — at eval time activations are permanently scaled by
    (1-p), at train time masked values keep their original magnitude;
  * asymmetric bottlenecks run Conv(1,5) (bias-free) then Conv(5,1)
    (with bias) with a single BN+PReLU after the pair (enet.py:309-310);
  * downsample bottlenecks: bias-free 2x2/s2 conv; main branch maxpool +
    zero-pad channels appended at the END (Padding(0, k, 0, 0, 3));
  * mid 3x3 convs carry a bias, the 1x1 expand/reduce convs do not;
  * BatchNorm eps = 1e-3;
  * layer plan: initial(3->16 concat) -> down64 + 4 regular ->
    down128 + [reg, dil2, asym, dil4, reg, dil8, asym, dil16] x 2,
    then a bias-free 1x1 classifier conv (enet.py:586-590);
  * `create_enet_for_3d` (enet.py:697-717) splits off that classifier
    (model[n-1]); the 128-d map the projection pipeline consumes is the
    output of all 22 bottlenecks. `ENetEncoder()` reproduces exactly
    that; pass num_classes to append the classifier conv.

Direct-oracle parity vs the imported reference module:
tests/test_refparity_enet.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# (kind, dilation) for each of the 8 bottlenecks in stages 2 and 3
_STAGE_PLAN = (
    ("regular", 1), ("dilated", 2), ("asym", 1), ("dilated", 4),
    ("regular", 1), ("dilated", 8), ("asym", 1), ("dilated", 16),
)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(C); flax's PReLU is scalar)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda _, shape: jnp.full(shape, 0.25, jnp.float32),
            (x.shape[-1],),
        )
        return jnp.where(x >= 0, x, alpha * x)


class RefDropout(nn.Module):
    """The reference's rescale-cancelling Dropout2d (enet.py:88-95):
    always scales by (1-p); train-time masking keeps original magnitude
    (the (1-p) pre-scale cancels inverted dropout's 1/(1-p))."""

    rate: float

    @nn.compact
    def __call__(self, x, *, train=False):
        x = x * (1.0 - self.rate)
        if train and self.rate > 0.0:
            x = nn.Dropout(self.rate)(x, deterministic=False)
        return x


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                        use_fast_variance=False, name=name)


class InitialBlock(nn.Module):
    """concat[Conv2d(3,13,3x3,s2,p1), MaxPool2x2] -> BN -> PReLU
    (enet.py:130-137)."""

    @nn.compact
    def __call__(self, x):
        conv = nn.Conv(13, (3, 3), strides=2, padding=1, name="conv")(x)
        pool = nn.max_pool(x, (2, 2), strides=(2, 2))
        y = jnp.concatenate([conv, pool], axis=-1)  # 13 + 3 = 16
        y = _bn("bn")(y)
        return PReLU(name="prelu")(y)


class Bottleneck(nn.Module):
    """One residual bottleneck of the torch7 graph; `kind` selects the
    ext-branch conv layout (enet.py:143-244 and the stage-2/3 bodies)."""

    out_ch: int
    inter_ch: int
    kind: str = "regular"  # regular | down | dilated | asym
    dilation: int = 1
    pdrop: float = 0.1

    @nn.compact
    def __call__(self, x, *, train=False):
        main = x
        if self.kind == "down":
            main = nn.max_pool(main, (2, 2), strides=(2, 2))
        if main.shape[-1] != self.out_ch:
            pad = self.out_ch - main.shape[-1]
            main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))

        if self.kind == "down":
            y = nn.Conv(self.inter_ch, (2, 2), strides=2, padding="VALID",
                        use_bias=False, name="conv0")(x)
        else:
            y = nn.Conv(self.inter_ch, (1, 1), use_bias=False,
                        name="conv0")(x)
        y = _bn("bn0")(y)
        y = PReLU(name="prelu0")(y)

        if self.kind == "asym":
            y = nn.Conv(self.inter_ch, (1, 5), padding=((0, 0), (2, 2)),
                        use_bias=False, name="conv1a")(y)
            y = nn.Conv(self.inter_ch, (5, 1), padding=((2, 2), (0, 0)),
                        name="conv1b")(y)
        else:
            d = self.dilation
            y = nn.Conv(self.inter_ch, (3, 3), padding=d,
                        kernel_dilation=d, name="conv1")(y)
        y = _bn("bn1")(y)
        y = PReLU(name="prelu1")(y)

        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv2")(y)
        y = _bn("bn2")(y)
        y = RefDropout(self.pdrop, name="drop")(y, train=train)

        return PReLU(name="prelu_out")(y + main)


def enet_block_specs() -> list[dict]:
    """The 22-bottleneck plan in execution order (shared by the module
    and the torch-checkpoint converter)."""
    specs = [dict(out_ch=64, inter_ch=16, kind="down", dilation=1,
                  pdrop=0.01)]
    specs += [dict(out_ch=64, inter_ch=16, kind="regular", dilation=1,
                   pdrop=0.01) for _ in range(4)]
    specs += [dict(out_ch=128, inter_ch=32, kind="down", dilation=1,
                   pdrop=0.1)]
    for _ in range(2):
        specs += [dict(out_ch=128, inter_ch=32, kind=k, dilation=d,
                       pdrop=0.1) for k, d in _STAGE_PLAN]
    return specs


class ENetEncoder(nn.Module):
    """(B, H, W, 3) -> (B, H/8, W/8, 128) feature map.

    Matches the reference's feature extractor (fixed+trainable of
    create_enet_for_3d, enet.py:697-706): all 22 bottlenecks, classifier
    conv excluded. With num_classes set, the bias-free 1x1 classifier
    conv (model[n-1], enet.py:586-590) is appended and logits are
    returned."""

    num_classes: int | None = None

    @nn.compact
    def __call__(self, x, *, train=False):
        y = InitialBlock(name="initial")(x)
        for i, spec in enumerate(enet_block_specs()):
            y = Bottleneck(**spec, name=f"block{i}")(y, train=train)
        if self.num_classes is not None:
            y = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                        name="classifier")(y)
        return y


# ---------------------------------------------------------------------------
# torch checkpoint import (scannetv2_enet.pth / create_enet state_dict)
# ---------------------------------------------------------------------------

def convert_enet_state_dict(state_dict, num_classes: int | None = None):
    """Map a torch `create_enet` state_dict onto ENetEncoder variables.

    Works positionally: the torch Sequential registers parameters in
    execution order, which is exactly the order enet_block_specs walks.
    Accepts tensors or numpy arrays; returns {"params", "batch_stats"}.
    With num_classes set, the trailing 1x1 classifier conv is mapped too.
    """
    items = [(k, np.asarray(getattr(v, "numpy", lambda: v)()))
             for k, v in state_dict.items()]
    pos = 0

    def take(n):
        nonlocal pos
        out = items[pos:pos + n]
        pos += n
        return out

    params: dict = {}
    stats: dict = {}

    def put_conv(path, use_bias=True):
        w = take(1)[0][1]
        entry = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
        if use_bias:
            entry["bias"] = jnp.asarray(take(1)[0][1])
        _set(params, path, entry)

    def put_bn(path):
        # torch order: weight, bias, running_mean, running_var
        # (+ num_batches_tracked in newer dumps)
        vals = take(2)
        scale, bias = vals[0][1], vals[1][1]
        rm_items = take(2)
        mean, var = rm_items[0][1], rm_items[1][1]
        if pos < len(items) and items[pos][0].endswith("num_batches_tracked"):
            take(1)
        _set(params, path, {"scale": jnp.asarray(scale),
                            "bias": jnp.asarray(bias)})
        _set(stats, path, {"mean": jnp.asarray(mean),
                           "var": jnp.asarray(var)})

    def put_prelu(path):
        _set(params, path, {"alpha": jnp.asarray(take(1)[0][1].reshape(-1))})

    put_conv("initial/conv")
    put_bn("initial/bn")
    put_prelu("initial/prelu")

    for i, spec in enumerate(enet_block_specs()):
        b = f"block{i}"
        put_conv(f"{b}/conv0", use_bias=False)
        put_bn(f"{b}/bn0")
        put_prelu(f"{b}/prelu0")
        if spec["kind"] == "asym":
            put_conv(f"{b}/conv1a", use_bias=False)
            put_conv(f"{b}/conv1b")
        else:
            put_conv(f"{b}/conv1")
        put_bn(f"{b}/bn1")
        put_prelu(f"{b}/prelu1")
        put_conv(f"{b}/conv2", use_bias=False)
        put_bn(f"{b}/bn2")
        put_prelu(f"{b}/prelu_out")

    if num_classes is not None:
        put_conv("classifier", use_bias=False)

    return {"params": params, "batch_stats": stats}


def _set(tree: dict, path: str, leaf: dict):
    parts = path.split("/")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = leaf
