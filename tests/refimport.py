"""Weight-import helpers for DIRECT reference-parity tests: map torch
state_dict tensors from the reference nn.Modules onto our flax param /
batch_stats trees.

Conventions:
  * reference Conv1d/Conv2d k=1 weights (out, in, 1[, 1]) -> Dense kernel
    (in, out) by squeezing the spatial dims and transposing;
  * reference BatchNorm*d -> flax BatchNorm {scale, bias} params +
    {mean, var} batch_stats;
  * reference SharedMLP layers (lib/pointnet2/pytorch_utils.py: conv
    bias=False when bn) -> our SAModule's split first layer
    (first_xyz/first_feat) + PointMLP stack (vlp3d/models/layers.py).
"""

import jax.numpy as jnp


def conv_kernel(sd, name):
    """Conv k=1 weight (out, in, 1[, 1]) -> Dense kernel (in, out)."""
    w = sd[name].numpy()
    w = w.reshape(w.shape[0], w.shape[1])
    return jnp.asarray(w.T)


def dense(sd, name, bias=True):
    p = {"kernel": conv_kernel(sd, name + ".weight")}
    if bias:
        p["bias"] = jnp.asarray(sd[name + ".bias"].numpy())
    return p


def bn(sd, name):
    """BatchNorm*d -> (params, stats)."""
    params = {
        "scale": jnp.asarray(sd[name + ".weight"].numpy()),
        "bias": jnp.asarray(sd[name + ".bias"].numpy()),
    }
    stats = {
        "mean": jnp.asarray(sd[name + ".running_mean"].numpy()),
        "var": jnp.asarray(sd[name + ".running_var"].numpy()),
    }
    return params, stats


def import_sa(sd, prefix):
    """PointnetSAModuleVotes state dict -> our SAModule tree.

    The reference's first SharedMLP conv acts on [xyz_rel; features]
    concat channels; our SAModule splits it into first_xyz (rows 0:3)
    and first_feat (rows 3:) Dense kernels (layers.py fused first layer).
    """
    w0 = conv_kernel(sd, f"{prefix}.mlp_module.layer0.conv.weight")
    params = {
        "first_xyz": {"kernel": w0[:3]},
        "first_feat": {"kernel": w0[3:]},
    }
    stats = {}
    params["BatchNorm_0"], stats["BatchNorm_0"] = bn(
        sd, f"{prefix}.mlp_module.layer0.bn.bn")
    pm, sm = {}, {}
    j = 1
    while f"{prefix}.mlp_module.layer{j}.conv.weight" in sd:
        pm[f"Dense_{j-1}"] = {
            "kernel": conv_kernel(
                sd, f"{prefix}.mlp_module.layer{j}.conv.weight")}
        pm[f"BatchNorm_{j-1}"], sm[f"BatchNorm_{j-1}"] = bn(
            sd, f"{prefix}.mlp_module.layer{j}.bn.bn")
        j += 1
    params["PointMLP_0"], stats["PointMLP_0"] = pm, sm
    return params, stats


def import_point_mlp(sd, prefix, layers):
    """SharedMLP (no split first layer) -> PointMLP tree.

    layers: iterable of reference layer indices (e.g. range(2)).
    """
    pm, sm = {}, {}
    for i, j in enumerate(layers):
        pm[f"Dense_{i}"] = {
            "kernel": conv_kernel(sd, f"{prefix}.layer{j}.conv.weight")}
        pm[f"BatchNorm_{i}"], sm[f"BatchNorm_{i}"] = bn(
            sd, f"{prefix}.layer{j}.bn.bn")
    return pm, sm


def lin(sd, name):
    """torch nn.Linear -> Dense params."""
    return {"kernel": jnp.asarray(sd[name + ".weight"].numpy().T),
            "bias": jnp.asarray(sd[name + ".bias"].numpy())}


def ln(sd, name):
    """torch LayerNorm -> flax LayerNorm params."""
    return {"scale": jnp.asarray(sd[name + ".weight"].numpy()),
            "bias": jnp.asarray(sd[name + ".bias"].numpy())}


def emb(sd, name):
    return {"embedding": jnp.asarray(sd[name + ".weight"].numpy())}


def import_xbert_text(sd, fusion_layer, prefix="bert."):
    """Vendored-xbert BertModel state dict (optionally under a
    'bert.' prefix, as in BertForMaskedLM) -> our BertTextEncoder
    text-mode tree: embeddings + self-attention layers [0, fusion_layer)
    (xbert.py:550-552)."""
    p = prefix
    params = {"embeddings": {
        "word_embeddings": emb(sd, f"{p}embeddings.word_embeddings"),
        "position_embeddings": emb(
            sd, f"{p}embeddings.position_embeddings"),
        "token_type_embeddings": emb(
            sd, f"{p}embeddings.token_type_embeddings"),
        "LayerNorm": ln(sd, f"{p}embeddings.LayerNorm"),
    }}
    for i in range(fusion_layer):
        q = f"{p}encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "query": lin(sd, f"{q}.attention.self.query"),
            "key": lin(sd, f"{q}.attention.self.key"),
            "value": lin(sd, f"{q}.attention.self.value"),
            "attention_output": lin(sd, f"{q}.attention.output.dense"),
            "attention_LayerNorm": ln(
                sd, f"{q}.attention.output.LayerNorm"),
            "intermediate": lin(sd, f"{q}.intermediate.dense"),
            "output": lin(sd, f"{q}.output.dense"),
            "output_LayerNorm": ln(sd, f"{q}.output.LayerNorm"),
        }
    return params


def randomize_bn_stats(torch, module):
    """Give every BatchNorm non-trivial eval statistics/affine params so
    import bugs can't hide behind the mean-0/var-1/weight-1 init."""
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
