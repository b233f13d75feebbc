"""Weight-import helpers for DIRECT reference-parity tests.

The mappings themselves are PRODUCT code (vlp3d/models/torch_import.py,
the `vlp3d-import-torch` path); re-exported here so every parity test
that imports reference weights also validates the production importer.
"""

from vlp3d.models.torch_import import (  # noqa: F401
    attflat, bn, cadl, conv_kernel, dense, emb, import_caption_state_dict,
    import_jointnet_state_dict, import_point_mlp, import_sa,
    import_xbert_text, lin, ln, mha, prelu,
)


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
