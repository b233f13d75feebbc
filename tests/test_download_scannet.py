"""download_scannet CLI logic with an injected (offline) fetcher."""

import os

from vlp3d.cli.download_scannet import (
    BASE_URL,
    FILE_TYPES,
    download_label_map,
    download_scan,
    get_release_scans,
)


def _fake_fetch(log):
    def fetch(url, out_file):
        log.append(url)
        os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
        with open(out_file, "w") as f:
            if url.endswith("scans.txt"):
                f.write("scene0000_00\nscene0001_00\n")
            else:
                f.write(url)
    return fetch


def test_download_scan_layout(tmp_path):
    log = []
    written = download_scan(
        "scene0000_00", str(tmp_path), fetch=_fake_fetch(log),
        file_types=["_vh_clean_2.ply", ".txt"],
    )
    assert len(written) == 2
    ply = tmp_path / "scans" / "scene0000_00" / "scene0000_00_vh_clean_2.ply"
    assert ply.exists()
    assert log[0] == (
        BASE_URL + "v2/scans/scene0000_00/scene0000_00_vh_clean_2.ply"
    )
    # skip_existing: a second call fetches nothing
    assert download_scan(
        "scene0000_00", str(tmp_path), fetch=_fake_fetch(log),
        file_types=["_vh_clean_2.ply", ".txt"],
    ) == []


def test_release_index_and_label_map(tmp_path):
    log = []
    scans = get_release_scans(_fake_fetch(log), "v2")
    assert scans == ["scene0000_00", "scene0001_00"]
    out = download_label_map(str(tmp_path), fetch=_fake_fetch(log))
    assert out.endswith("scannetv2-labels.combined.tsv")
    assert os.path.exists(out)
    assert any("v2/tasks/scannetv2-labels.combined.tsv" in u for u in log)


def test_file_types_cover_export_needs():
    # the offline export consumes these four per scan
    # (vlp3d/data/scannet.py::export_one_scan)
    for needed in (
        "_vh_clean_2.ply", ".aggregation.json",
        "_vh_clean_2.0.010000.segs.json", ".txt",
    ):
        assert needed in FILE_TYPES
