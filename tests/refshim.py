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


def _pointnet2_ext_module(torch):
    """Functional CPU-torch implementation of the pointnet2._ext CUDA
    kernels (semantics per lib/pointnet2/_ext_src/src/*.cu, identical to
    tests/oracles.py). Lets the reference backbone / proposal modules run
    on CPU as parity oracles."""
    mod = types.ModuleType("pointnet2._ext")

    def furthest_point_sampling(xyz, npoint):
        # sampling_gpu.cu:74-178: start at 0, skip |p|^2<=1e-3, first-max
        b, n, _ = xyz.shape
        pts = xyz.double()
        valid = (pts ** 2).sum(-1) > 1e-3
        temp = torch.full((b, n), 1e10, dtype=torch.float64)
        out = torch.zeros(b, npoint, dtype=torch.int32)
        old = torch.zeros(b, dtype=torch.long)
        rows = torch.arange(b)
        for j in range(1, npoint):
            d = ((pts - pts[rows, old][:, None, :]) ** 2).sum(-1)
            temp = torch.minimum(temp, d)
            cand = torch.where(valid, temp, torch.full_like(temp, -1.0))
            old = cand.argmax(1)
            out[:, j] = old.int()
        return out

    def gather_points(features, idx):
        # (B, C, N), (B, np) -> (B, C, np); clone for the same
        # view+inplace reason as group_points
        return torch.gather(
            features, 2,
            idx.long()[:, None, :].expand(-1, features.shape[1], -1),
        ).clone()

    def gather_points_grad(grad_out, idx, n):
        b, c, np_ = grad_out.shape
        g = torch.zeros(b, c, n, dtype=grad_out.dtype)
        return g.scatter_add(
            2, idx.long()[:, None, :].expand(-1, c, -1), grad_out)

    def ball_query(new_xyz, xyz, radius, nsample):
        # ball_query_gpu.cu:14-49: first nsample in scan order,
        # pad-with-first, zeros when empty
        b, m, _ = new_xyz.shape
        n = xyz.shape[1]
        d2 = ((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
        inball = d2 < radius * radius
        cnt = inball.cumsum(-1)
        sel = inball & (cnt <= nsample)
        out = torch.zeros(b, m, nsample, dtype=torch.long)
        bi, mi, ni = sel.nonzero(as_tuple=True)
        out[bi, mi, (cnt[bi, mi, ni] - 1)] = ni
        total = cnt[..., -1].clamp(max=nsample)
        pos = torch.arange(nsample)
        pad = pos[None, None, :] >= total[..., None]
        out = torch.where(pad, out[..., :1], out)
        return out.int()

    def group_points(features, idx):
        # (B, C, N), (B, np, ns) -> (B, C, np, ns)
        b, c, n = features.shape
        _, np_, ns = idx.shape
        flat = torch.gather(
            features, 2,
            idx.long().reshape(b, 1, np_ * ns).expand(-1, c, -1))
        # clone: the caller's custom Function would otherwise return a
        # reshape-view, and the reference mutates it in place
        # (pointnet2_utils.py:346) — forbidden under grad mode
        return flat.reshape(b, c, np_, ns).clone()

    def group_points_grad(grad_out, idx, n):
        b, c, np_, ns = grad_out.shape
        g = torch.zeros(b, c, n, dtype=grad_out.dtype)
        return g.scatter_add(
            2, idx.long().reshape(b, 1, np_ * ns).expand(-1, c, -1),
            grad_out.reshape(b, c, np_ * ns))

    def three_nn(unknown, known):
        # interpolate_gpu.cu:14-64: 3 smallest squared distances, strict <
        d2 = ((unknown[:, :, None, :] - known[:, None, :, :]) ** 2).sum(-1)
        d2s, idx = torch.sort(d2, dim=-1, stable=True)
        return d2s[..., :3].contiguous(), idx[..., :3].int().contiguous()

    def three_interpolate(features, idx, weight):
        # (B, c, m), (B, n, 3), (B, n, 3) -> (B, c, n)
        b, c, m = features.shape
        n = idx.shape[1]
        gathered = torch.gather(
            features, 2,
            idx.long().reshape(b, 1, n * 3).expand(-1, c, -1)
        ).reshape(b, c, n, 3)
        return (gathered * weight[:, None, :, :]).sum(-1)

    def three_interpolate_grad(grad_out, idx, weight, m):
        b, c, n = grad_out.shape
        g = torch.zeros(b, c, m, dtype=grad_out.dtype)
        contrib = (grad_out[..., None] * weight[:, None, :, :]).reshape(
            b, c, n * 3)
        return g.scatter_add(
            2, idx.long().reshape(b, 1, n * 3).expand(-1, c, -1), contrib)

    mod.furthest_point_sampling = furthest_point_sampling
    mod.gather_points = gather_points
    mod.gather_points_grad = gather_points_grad
    mod.ball_query = ball_query
    mod.group_points = group_points
    mod.group_points_grad = group_points_grad
    mod.three_nn = three_nn
    mod.three_interpolate = three_interpolate
    mod.three_interpolate_grad = three_interpolate_grad
    return mod


def _pytorch3d_module(torch):
    """Stub for pytorch3d.ops.iou_box3d.box3d_overlap, exact for the
    axis-aligned corner boxes the reference feeds it (create_box_batch,
    constrast_module.py:9-15 — ScanNet headings are identically 0, see
    model_util_scannet.py:133-143)."""
    pkg = types.ModuleType("pytorch3d")
    ops = types.ModuleType("pytorch3d.ops")
    mod = types.ModuleType("pytorch3d.ops.iou_box3d")

    def box3d_overlap(boxes1, boxes2, eps=1e-4):
        # real pytorch3d raises on empty/invalid box batches — the
        # reference RELIES on that (its try/except skips scenes with no
        # positive proposals, constrast_module.py:104-125)
        if boxes1.numel() == 0 or boxes2.numel() == 0:
            raise ValueError("box3d_overlap: empty box batch")
        mins1, maxs1 = boxes1.min(dim=1).values, boxes1.max(dim=1).values
        mins2, maxs2 = boxes2.min(dim=1).values, boxes2.max(dim=1).values
        lo = torch.maximum(mins1[:, None, :], mins2[None, :, :])
        hi = torch.minimum(maxs1[:, None, :], maxs2[None, :, :])
        inter = (hi - lo).clamp(min=0).prod(-1)
        vol1 = (maxs1 - mins1).prod(-1)
        vol2 = (maxs2 - mins2).prod(-1)
        union = vol1[:, None] + vol2[None, :] - inter
        return inter, inter / union

    mod.box3d_overlap = box3d_overlap
    ops.iou_box3d = mod
    pkg.ops = ops
    sys.modules["pytorch3d"] = pkg
    sys.modules["pytorch3d.ops"] = ops
    sys.modules["pytorch3d.ops.iou_box3d"] = mod


_PLY_SCALARS = {
    "float": ("f", 4, "<f4"), "float32": ("f", 4, "<f4"),
    "double": ("d", 8, "<f8"), "float64": ("d", 8, "<f8"),
    "uchar": ("B", 1, "u1"), "uint8": ("B", 1, "u1"),
    "char": ("b", 1, "i1"), "int8": ("b", 1, "i1"),
    "short": ("h", 2, "<i2"), "int16": ("h", 2, "<i2"),
    "ushort": ("H", 2, "<u2"), "uint16": ("H", 2, "<u2"),
    "int": ("i", 4, "<i4"), "int32": ("i", 4, "<i4"),
    "uint": ("I", 4, "<u4"), "uint32": ("I", 4, "<u4"),
}


class _MiniPlyElement:
    def __init__(self, count, data):
        self.count = count
        self.data = data


class _MiniPlyData:
    """binary_little_endian PLY reader covering what the reference's
    scannet_utils readers use (scalar vertex properties + one list-typed
    face property)."""

    def __init__(self, elements):
        self._elements = elements

    def __getitem__(self, name):
        return self._elements[name]

    @staticmethod
    def read(f):
        import struct

        import numpy as np

        elements = []  # (name, count, props) with props per header order
        fmt = None
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                elements.append((name, int(cnt), []))
            elif line.startswith("property"):
                elements[-1][2].append(line.split()[1:])
            elif line == "end_header":
                break
        assert fmt == "binary_little_endian", fmt

        out = {}
        for name, count, props in elements:
            if any(p[0] == "list" for p in props):
                assert len(props) == 1, "one list property per element"
                _, cnt_t, idx_t, _pname = props[0]
                csz, isz = _PLY_SCALARS[cnt_t][1], _PLY_SCALARS[idx_t][1]
                cfmt, ifmt = _PLY_SCALARS[cnt_t][0], _PLY_SCALARS[idx_t][0]
                rows = np.empty(count, dtype=object)
                for i in range(count):
                    (k,) = struct.unpack("<" + cfmt, f.read(csz))
                    idx = struct.unpack("<" + ifmt * k, f.read(isz * k))
                    rows[i] = (np.asarray(idx, np.int64),)
                out[name] = _MiniPlyElement(count, rows)
            else:
                dtype = np.dtype(
                    [(p[1], _PLY_SCALARS[p[0]][2]) for p in props]
                )
                raw = f.read(dtype.itemsize * count)
                out[name] = _MiniPlyElement(
                    count, np.frombuffer(raw, dtype=dtype, count=count)
                )
        return _MiniPlyData(out)


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
        # numpy >= 1.24 removed the np.bool alias the reference still
        # uses (lib/joint/dataset.py:897)
        import numpy as _np

        if not hasattr(_np, "bool"):
            _np.bool = bool
        sys.modules.setdefault("easydict", _easydict_module())
        sys.modules.setdefault("torch_scatter", _torch_scatter_module(torch))
        sys.modules.setdefault("numba", _numba_module())
        # trimesh is only touched inside pc_utils helpers our parity
        # tests never call; an empty module satisfies the import
        sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
        # plyfile: functional minimal stand-in (pc_utils.py:15-20
        # hard-exits when the import fails, so it must pre-exist; the
        # ScanNet export oracle actually READS meshes through it —
        # scannet_utils.py:97-117 needs ['vertex'].data field access +
        # row unpacking and ['face'].data rows whose [0] is the index
        # list)
        ply = types.ModuleType("plyfile")
        ply.PlyData = _MiniPlyData
        ply.PlyElement = type("PlyElement", (), {})
        sys.modules.setdefault("plyfile", ply)
        if "pytorch3d" not in sys.modules:
            _pytorch3d_module(torch)
        if "pointnet2._ext" not in sys.modules:
            pkg = types.ModuleType("pointnet2")
            ext = _pointnet2_ext_module(torch)
            pkg._ext = ext
            sys.modules["pointnet2"] = pkg
            sys.modules["pointnet2._ext"] = ext
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
        # lib/pointnet2 modules import siblings top-level
        # (pointnet2_utils.py:17 `import pytorch_utils`)
        pn2 = os.path.join(REF_ROOT, "lib", "pointnet2")
        if pn2 not in sys.path:
            sys.path.append(pn2)
        _loaded = True
    torch.manual_seed(0)
    return torch
