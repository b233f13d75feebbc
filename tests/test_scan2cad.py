"""Scan2CAD rotation parsing (Scan2CAD_to_ScanNet.py)."""

import json

import numpy as np

from vlp3d.data.scan2cad import parse_scan2cad_rotations, quaternion_to_matrix


def test_quaternion_to_matrix():
    # identity
    np.testing.assert_allclose(
        quaternion_to_matrix([1, 0, 0, 0]), np.eye(3), atol=1e-12
    )
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    c = np.cos(np.pi / 4)
    m = quaternion_to_matrix([c, 0, 0, c])
    np.testing.assert_allclose(
        m @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-12
    )
    # unnormalized input is normalized
    np.testing.assert_allclose(
        quaternion_to_matrix([2, 0, 0, 0]), np.eye(3), atol=1e-12
    )
    # orthonormality for a random quaternion
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    m = quaternion_to_matrix(q)
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(m) > 0


def test_parse_scan2cad(tmp_path):
    c = np.cos(np.pi / 4)
    annotations = [
        {
            "id_scan": "scene0000_00",
            "aligned_models": [
                {"trs": {"rotation": [1, 0, 0, 0]}},
                {"trs": {"rotation": [c, 0, 0, c]}},
                {"trs": {"rotation": [1, 0, 0, 0]}},  # no inst mapping
            ],
        },
        {"id_scan": "scene0001_00", "aligned_models": []},
    ]
    cad2inst = {"scene0000_00": {"0": 7, "1": 3}}
    parsed = parse_scan2cad_rotations(annotations, cad2inst)
    assert set(parsed) == {"scene0000_00"}
    assert set(parsed["scene0000_00"]) == {7, 3}
    np.testing.assert_allclose(
        np.asarray(parsed["scene0000_00"][7]), np.eye(3), atol=1e-12
    )

    # CLI round trip
    from vlp3d.cli.preprocess_annotations import main

    ann_p = tmp_path / "full_annotations.json"
    map_p = tmp_path / "aligned_cad2inst_id.json"
    out_p = tmp_path / "rotations.json"
    json.dump(annotations, open(ann_p, "w"))
    json.dump(cad2inst, open(map_p, "w"))
    main(["scan2cad", "--annotations", str(ann_p), "--cad2inst", str(map_p),
          "--out", str(out_p)])
    got = json.load(open(out_p))
    assert "scene0000_00" in got and "7" in got["scene0000_00"]
