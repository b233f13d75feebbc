"""Harness for DIRECT parity tests against the reference PyTorch code.

The round-1/2 parity evidence is numpy *transcriptions* of the reference
semantics (tests/oracles.py).  When the reference checkout is available
at /root/reference (read-only) and torch-CPU is installed, we can do
strictly better: import the reference's own pure-Python modules and
assert our JAX implementations match the actual code, eliminating
transcription drift as an error class.

The reference needs four small third-party modules that are not in this
image (easydict, torch_scatter, numba, trimesh) and calls ``.cuda()``
inline.  ``load_reference()`` installs minimal functional stubs for the
former and identity-patches the latter, then puts /root/reference on
sys.path.  Tests calling it skip cleanly when the checkout is absent, so
the repo remains standalone.

No reference code is copied into this repository; it is imported at
test time only, as an oracle.
"""

import os
import sys
import types

import pytest

REF_ROOT = "/root/reference"


def _easydict_module():
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        """Attribute-style dict matching the subset the reference uses
        (easydict's recursive attr/item mirroring)."""

        def __init__(self, d=None, **kwargs):
            super().__init__()
            for k, v in dict(d or {}, **kwargs).items():
                setattr(self, k, v)

        def __setattr__(self, name, value):
            if isinstance(value, dict) and not isinstance(value, EasyDict):
                value = EasyDict(value)
            object.__setattr__(self, name, value)
            self[name] = value

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

    mod.EasyDict = EasyDict
    return mod


def _torch_scatter_module(torch):
    mod = types.ModuleType("torch_scatter")

    def scatter(src, index, dim=0, dim_size=None, reduce="mean"):
        # functional equivalent of torch_scatter.scatter for the
        # reference's call (loss_grounding.py:116: dim=1, reduce="mean",
        # index broadcast over trailing dims)
        assert reduce == "mean"
        if dim < 0:
            dim += src.dim()
        size = int(index.max()) + 1 if dim_size is None else dim_size
        while index.dim() < src.dim():
            index = index.unsqueeze(-1)
        index = index.expand_as(src)
        shape = list(src.shape)
        shape[dim] = size
        out = torch.zeros(shape, dtype=src.dtype)
        return out.scatter_reduce(dim, index, src, reduce="mean",
                                  include_self=False)

    mod.scatter = scatter
    return mod


def _numba_module():
    mod = types.ModuleType("numba")

    def jit(*args, **kwargs):
        # supports both @numba.jit and @numba.jit(nopython=True)
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda fn: fn

    mod.jit = jit
    mod.njit = jit
    return mod


_loaded = False


def load_reference():
    """Make /root/reference importable; return the torch module.

    Skips the calling test when the checkout is unavailable.
    """
    global _loaded
    if not os.path.isdir(os.path.join(REF_ROOT, "lib")):
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    if not _loaded:
        sys.modules.setdefault("easydict", _easydict_module())
        sys.modules.setdefault("torch_scatter", _torch_scatter_module(torch))
        sys.modules.setdefault("numba", _numba_module())
        # trimesh is only touched inside pc_utils helpers our parity
        # tests never call; an empty module satisfies the import
        sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
        # the reference hard-codes .cuda() on tensors/modules; identity
        # on CPU-only torch
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self
        torch.cuda.FloatTensor = torch.FloatTensor
        torch.cuda.LongTensor = torch.LongTensor
        # the vendored xbert imports symbols that current transformers
        # moved to pytorch_utils; backfill them
        try:
            import transformers.modeling_utils as _mu
            import transformers.pytorch_utils as _ptu

            for _n in ("apply_chunking_to_forward",
                       "find_pruneable_heads_and_indices",
                       "prune_linear_layer"):
                if not hasattr(_mu, _n):
                    setattr(_mu, _n, getattr(_ptu, _n))
        except ImportError:
            pass
        if REF_ROOT not in sys.path:
            sys.path.insert(0, REF_ROOT)
        _loaded = True
    torch.manual_seed(0)
    return torch
