"""Frozen-benchmark-fixture pinning (io/fixtures.py).

The bench's regression gate is only meaningful if the input bytes are
identical round over round (VERDICT r4 missing #1: a 4e-4-gray-level
renderer delta moved the headline -18%). These tests pin the contract:
the committed npz bytes match the manifest hash, tampering is detected,
and a stale renderer tag refuses to load.
"""

import json
import os

import numpy as np
import pytest

from cv_monoslam_tpu.io import fixtures


def test_manifest_covers_all_specs():
    man = fixtures._read_manifest()
    for name in fixtures.SPECS:
        assert name in man["files"], f"fixture {name} not built/committed"
        assert os.path.exists(
            os.path.join(fixtures.FIXTURES_DIR, name + ".npz"))


def test_load_verifies_and_returns_frozen_bytes():
    seq, track, gt_xy, gt_th = fixtures.load("bench1_arc")
    assert seq._frames.dtype == np.uint8
    assert seq._frames.shape == (105, 480, 640)
    assert len(gt_xy) == 105
    # the loaded track reflects the fixture's raw odometry deterministically
    seq2, track2, _, _ = fixtures.load("bench1_arc")
    np.testing.assert_array_equal(track.xy, track2.xy)


def test_tampered_fixture_refuses(tmp_path, monkeypatch):
    # copy one fixture + manifest into a sandbox, flip a byte, expect load
    # to refuse
    name = "bench1_arc"
    src = os.path.join(fixtures.FIXTURES_DIR, name + ".npz")
    with open(src, "rb") as f:
        data = bytearray(f.read())
    data[len(data) // 2] ^= 0xFF
    (tmp_path / (name + ".npz")).write_bytes(bytes(data))
    man = fixtures._read_manifest()
    (tmp_path / "MANIFEST.json").write_text(json.dumps(man))
    monkeypatch.setattr(fixtures, "FIXTURES_DIR", str(tmp_path))
    monkeypatch.setattr(fixtures, "MANIFEST",
                        str(tmp_path / "MANIFEST.json"))
    with pytest.raises(RuntimeError, match="bytes changed"):
        fixtures.load(name)


def test_stale_renderer_tag_refuses(tmp_path, monkeypatch):
    man = fixtures._read_manifest()
    man["renderer"] = "v0-stale"
    (tmp_path / "MANIFEST.json").write_text(json.dumps(man))
    monkeypatch.setattr(fixtures, "MANIFEST",
                        str(tmp_path / "MANIFEST.json"))
    with pytest.raises(RuntimeError, match="rebuild fixtures"):
        fixtures.load("bench1_arc")


def test_missing_manifest_entry_refuses():
    with pytest.raises(FileNotFoundError):
        fixtures.load("no_such_fixture")
