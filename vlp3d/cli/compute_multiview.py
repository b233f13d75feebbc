"""Multiview feature extraction + projection entry point.

Mirrors `scripts/multiview_compute/compute_multiview_features.py` +
`project_multiview_features.py --maxpool`: run the ENet encoder over
every sampled video frame of each scene, project the per-pixel features
onto the scene's points through the frame depth + pose, max-pool over
frames, and write `enet_feats_maxpool.hdf5` with one (N, 128) dataset
per scene — the file the datasets consume via --multiview_hdf5.

Expected layout per scene under --frames_dir:
  <scene_id>/color/<frame>.npy   (H, W, 3) float or uint8 RGB
  <scene_id>/depth/<frame>.npy   (H, W) float depth in meters
  <scene_id>/pose/<frame>.txt    4x4 camera-to-world matrix
(The reference reads jpg/png + .pgm via imageio; npy keeps this
entry point dependency-free. Points come from the offline export's
{scene}_aligned_vert.npy under --scannet_data.)
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def enet_feature_fn(checkpoint: str | None = None):
    """Returns frame_rgb (H, W, 3) -> feature map (H//8, W//8, 128)."""
    import jax

    from vlp3d.models.enet import ENetEncoder

    model = ENetEncoder()
    variables = None

    def feats(frame: np.ndarray) -> np.ndarray:
        nonlocal variables
        import jax.numpy as jnp

        x = jnp.asarray(frame, jnp.float32)[None]
        if x.max() > 2.0:
            x = x / 255.0
        if variables is None:
            if checkpoint:
                from vlp3d.train import checkpoint as ckpt

                snap = ckpt.load_params(
                    os.path.dirname(checkpoint), os.path.basename(checkpoint)
                )
                variables = {
                    "params": snap["params"],
                    "batch_stats": snap.get("batch_stats", {}),
                }
            else:
                variables = model.init({"params": jax.random.key(0)}, x)
        out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
        return np.asarray(out[0])

    return feats


def main(argv=None):
    from vlp3d.data.multiview import (
        ProjectionHelper,
        maxpool_multiview_features,
        vote_multiview_labels,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--scannet_data", required=True)
    p.add_argument("--out", default="enet_feats_maxpool.hdf5")
    p.add_argument("--enet_checkpoint", default="")
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--labels", action="store_true",
                   help="project per-frame nyu40 label maps "
                        "(<scene>/label/<frame>.npy) with per-point "
                        "majority voting instead of features, writing "
                        "<scene>_multiview_labels.npy next to --out plus a "
                        "colored PLY (project_multiview_labels.py)")
    p.add_argument("--num_labels", type=int, default=41)
    # depth-camera intrinsics at the ORIGINAL frame resolution (ScanNet
    # defaults, project_multiview_features.py); scaled to feature res
    p.add_argument("--fx", type=float, default=577.870605)
    p.add_argument("--fy", type=float, default=577.870605)
    p.add_argument("--cx", type=float, default=319.5)
    p.add_argument("--cy", type=float, default=239.5)
    args = p.parse_args(argv)

    import h5py

    scenes = sorted(
        d for d in os.listdir(args.frames_dir)
        if os.path.isdir(os.path.join(args.frames_dir, d))
    )

    if args.labels:
        return _project_labels(args, scenes, ProjectionHelper,
                               vote_multiview_labels)

    feats_fn = enet_feature_fn(args.enet_checkpoint or None)
    with h5py.File(args.out, "w") as out:
        for scene in scenes:
            sdir = os.path.join(args.frames_dir, scene)
            frame_ids = sorted(
                os.path.splitext(os.path.basename(f))[0]
                for f in glob.glob(os.path.join(sdir, "color", "*.npy"))
            )
            if args.max_frames:
                frame_ids = frame_ids[: args.max_frames]
            points = np.load(
                os.path.join(args.scannet_data, f"{scene}_aligned_vert.npy")
            )[:, :3]
            frames = []
            projector = None
            for fid in frame_ids:
                rgb = np.load(os.path.join(sdir, "color", f"{fid}.npy"))
                depth = np.load(os.path.join(sdir, "depth", f"{fid}.npy"))
                pose = np.loadtxt(os.path.join(sdir, "pose", f"{fid}.txt"))
                fmap = feats_fn(rgb)
                # depth + intrinsics live at feature resolution: the
                # reference resizes depth to the feature map dims
                # (project_multiview_features.py:71-77)
                h, w = fmap.shape[:2]
                dh = depth[:: depth.shape[0] // h or 1,
                           :: depth.shape[1] // w or 1][:h, :w]
                if projector is None:
                    sx = w / rgb.shape[1]
                    sy = h / rgb.shape[0]
                    intr = np.array(
                        [[args.fx * sx, 0, args.cx * sx],
                         [0, args.fy * sy, args.cy * sy],
                         [0, 0, 1]],
                        np.float32,
                    )
                    projector = ProjectionHelper(
                        intrinsics=intr, image_dims=(w, h)
                    )
                frames.append((fmap, dh, pose))
            if not frames:
                continue
            mv = maxpool_multiview_features(points, frames, projector)
            out.create_dataset(scene, data=mv.astype(np.float32))
            print(f"{scene}: {len(frames)} frames -> {mv.shape}")
    print(f"wrote {args.out}")
    return args.out


def _project_labels(args, scenes, ProjectionHelper, vote_multiview_labels):
    """--labels mode: majority-voted per-point semantic labels + a
    label-colored PLY per scene (project_multiview_labels.py:148-178)."""
    from vlp3d.utils.visualize import write_ply_points

    out_dir = os.path.dirname(os.path.abspath(args.out)) or "."
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    palette = rng.integers(0, 255, size=(args.num_labels, 3))
    palette[0] = 0  # unannotated -> black
    written = []
    for scene in scenes:
        sdir = os.path.join(args.frames_dir, scene)
        frame_ids = sorted(
            os.path.splitext(os.path.basename(f))[0]
            for f in glob.glob(os.path.join(sdir, "label", "*.npy"))
        )
        if args.max_frames:
            frame_ids = frame_ids[: args.max_frames]
        points = np.load(
            os.path.join(args.scannet_data, f"{scene}_aligned_vert.npy")
        )[:, :3]
        frames = []
        projector = None
        for fid in frame_ids:
            label = np.load(os.path.join(sdir, "label", f"{fid}.npy"))
            depth = np.load(os.path.join(sdir, "depth", f"{fid}.npy"))
            pose = np.loadtxt(os.path.join(sdir, "pose", f"{fid}.txt"))
            h, w = label.shape[:2]
            dh = depth[:: depth.shape[0] // h or 1,
                       :: depth.shape[1] // w or 1][:h, :w]
            if projector is None:
                sx = w / (depth.shape[1] or w)
                sy = h / (depth.shape[0] or h)
                intr = np.array(
                    [[args.fx * sx, 0, args.cx * sx],
                     [0, args.fy * sy, args.cy * sy],
                     [0, 0, 1]],
                    np.float32,
                )
                projector = ProjectionHelper(
                    intrinsics=intr, image_dims=(w, h)
                )
            frames.append((label, dh, pose))
        if not frames:
            continue
        labels = vote_multiview_labels(
            points, frames, num_labels=args.num_labels, projector=projector
        )
        npy_path = os.path.join(out_dir, f"{scene}_multiview_labels.npy")
        np.save(npy_path, labels.astype(np.int64))
        write_ply_points(
            os.path.join(out_dir, f"{scene}_multiview_labels.ply"),
            points,
            palette[labels],
        )
        written.append(npy_path)
        print(f"{scene}: {len(frames)} frames -> labels {labels.shape}")
    print(f"wrote {len(written)} label files under {out_dir}")
    return written


if __name__ == "__main__":
    main()
