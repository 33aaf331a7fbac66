"""Native trajectory store: roundtrip, CRC integrity, fallback."""

import numpy as np
import pytest

from quadruped_springs_tpu.runtime import trajstore as ts


def test_native_builds():
    assert ts.have_native(), "g++ build of libtrajstore.so failed"


def test_roundtrip(tmp_path):
    rows = np.random.RandomState(0).randn(1000, 44).astype(np.float32)
    path = str(tmp_path / "demo.qsts")
    ts.write(path, rows)
    back = ts.read(path)
    np.testing.assert_array_equal(back, rows)


def test_crc_detects_corruption(tmp_path):
    rows = np.ones((10, 4), np.float32)
    path = str(tmp_path / "x.qsts")
    ts.write(path, rows)
    with open(path, "r+b") as f:
        f.seek(40)  # inside payload
        f.write(b"\xff\xff")
    with pytest.raises(IOError):
        ts.read(path)
    # unverified read still works
    assert ts.read(path, verify=False).shape == (10, 4)
