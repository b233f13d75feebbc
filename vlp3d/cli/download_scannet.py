"""ScanNet download helper.

Fresh implementation of the contract of the reference's root
`download-scannet.py` (itself the official ScanNet release script): after
terms-of-use confirmation, fetch scan files / the label map / task data
from the ScanNet release server into the layout the offline export
(`vlp3d.data.scannet.export_one_scan`) and `--scans_dir` tooling expect:

    <out_dir>/scans/<scan_id>/<scan_id><file_type>

Network access is injected (``fetch``) so the logic is testable offline;
the default uses urllib. This environment is zero-egress — the command
exists for users running it on their own machines.
"""

from __future__ import annotations

import argparse
import os
import tempfile

BASE_URL = "http://kaldir.vc.in.tum.de/scannet/"
TOS_URL = BASE_URL + "ScanNet_TOS.pdf"
RELEASES = {"v2": "v2/scans", "v1": "v1/scans"}
TASKS = {"v2": "v2/tasks", "v1": "v1/tasks"}
FILE_TYPES = [
    ".aggregation.json",
    ".sens",
    ".txt",
    "_vh_clean.ply",
    "_vh_clean_2.ply",
    "_vh_clean_2.0.010000.segs.json",
    "_vh_clean.segs.json",
    "_vh_clean.aggregation.json",
    "_vh_clean_2.labels.ply",
    "_2d-instance.zip",
    "_2d-instance-filt.zip",
    "_2d-label.zip",
    "_2d-label-filt.zip",
]
LABEL_MAP_FILES = {"v2": "scannetv2-labels.combined.tsv",
                   "v1": "scannet-labels.combined.tsv"}


def default_fetch(url: str, out_file: str) -> None:
    import urllib.request

    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    # download to a temp name then rename: a partial file never shadows a
    # complete one (the official script's fh/rename pattern)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out_file) or ".")
    os.close(fd)
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, out_file)


def get_release_scans(fetch, version: str) -> list[str]:
    """Scan id list from the release's <release>.txt index."""
    with tempfile.TemporaryDirectory() as d:
        idx = os.path.join(d, "release.txt")
        fetch(BASE_URL + RELEASES[version] + ".txt", idx)
        with open(idx) as f:
            return [line.strip() for line in f if line.strip()]


def download_scan(
    scan_id: str,
    out_dir: str,
    *,
    file_types=FILE_TYPES,
    version: str = "v2",
    fetch=default_fetch,
    skip_existing: bool = True,
) -> list[str]:
    scan_dir = os.path.join(out_dir, "scans", scan_id)
    os.makedirs(scan_dir, exist_ok=True)
    written = []
    for ft in file_types:
        out_file = os.path.join(scan_dir, scan_id + ft)
        if skip_existing and os.path.exists(out_file):
            continue
        url = f"{BASE_URL}{RELEASES[version]}/{scan_id}/{scan_id}{ft}"
        fetch(url, out_file)
        written.append(out_file)
    return written


def download_label_map(
    out_dir: str, *, version: str = "v2", fetch=default_fetch
) -> str:
    name = LABEL_MAP_FILES[version]
    out_file = os.path.join(out_dir, name)
    fetch(f"{BASE_URL}{TASKS[version]}/{name}", out_file)
    return out_file


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--id", default="",
                   help="one scan id; default: the whole release")
    p.add_argument("--type", nargs="*", default=None,
                   help="subset of file types (default: all)")
    p.add_argument("--label_map", action="store_true")
    p.add_argument("--v1", action="store_true")
    p.add_argument("--yes", action="store_true",
                   help="skip the terms-of-use prompt (CI)")
    args = p.parse_args(argv)

    version = "v1" if args.v1 else "v2"
    if not args.yes:
        print(
            "By continuing you confirm acceptance of the ScanNet terms of "
            f"use: {TOS_URL}"
        )
        if input("Press y to continue: ").strip().lower() != "y":
            return

    if args.label_map:
        out = download_label_map(args.out_dir, version=version)
        print(f"wrote {out}")
        return

    file_types = args.type or FILE_TYPES
    for ft in file_types:
        if ft not in FILE_TYPES:
            raise ValueError(f"unknown file type {ft}; known: {FILE_TYPES}")
    scans = [args.id] if args.id else get_release_scans(
        default_fetch, version
    )
    for scan_id in scans:
        written = download_scan(
            scan_id, args.out_dir, file_types=file_types, version=version
        )
        print(f"{scan_id}: {len(written)} files")


if __name__ == "__main__":
    main()
