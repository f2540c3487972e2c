"""C++ IO accelerator vs the pure-Python behavioral definition.

Builds native/libio_native.so on demand (skipped when no compiler)."""

import os
import subprocess

import numpy as np
import pytest

from refraction_tpu.io import native
from refraction_tpu.io.hdr import load_hdr, write_hdr
from refraction_tpu.io.objmesh import parse_obj

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


@pytest.fixture(scope="module")
def native_lib():
    # Always run make: it is an incremental no-op when the .so is up to
    # date and rebuilds it when io_native.cpp changed (a stale library
    # would silently test old semantics).
    try:
        subprocess.run(["make", "-C", os.path.join(ROOT, "native")],
                       check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build native lib: {e}")
    # reset the cached loader state so the fresh .so is picked up
    native._LIB = None
    native._TRIED = False
    if not native.available():
        pytest.skip("native lib failed to load")
    return native


OBJ_FIXTURE = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 1
vt 0 0
vt 0.25 0.75
vn 0 0 1
vn 0.5 0.5 0
f 1/1/1 2/2/1 3/1/2
f 1/1/2 2/2/2 3/1/1 4/2/2
f 1/1 2/2 3/1
f 9/1/1 2/2/2 3/1/1
garbage line
"""


def test_obj_matches_python(native_lib, tmp_path):
    p = str(tmp_path / "t.obj")
    with open(p, "w") as f:
        f.write(OBJ_FIXTURE)
    py = parse_obj(p, allow_native=False)
    nat = native_lib.parse_obj(p)
    assert nat is not None
    pos, norm, uv = nat
    assert pos.shape == py.positions.shape == (2, 3, 3)
    np.testing.assert_array_equal(pos, py.positions)
    np.testing.assert_array_equal(norm, py.normals)
    np.testing.assert_array_equal(uv, py.uvs)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference assets not mounted")
@pytest.mark.parametrize("name", ["cube.obj", "sphere.obj", "monkey.obj",
                                  "shell.obj", "ott.obj"])
def test_obj_reference_assets(native_lib, name):
    p = os.path.join(REF, name)
    py = parse_obj(p, allow_native=False)
    pos, norm, uv = native_lib.parse_obj(p)
    assert pos.shape[0] == py.num_tris
    np.testing.assert_array_equal(pos, py.positions)
    np.testing.assert_array_equal(norm, py.normals)
    np.testing.assert_array_equal(uv, py.uvs)


def test_hdr_matches_python(native_lib, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 8, (24, 40, 3)).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    write_hdr(p, img)
    py = load_hdr(p, allow_native=False)
    nat = native_lib.load_hdr(p)
    assert nat is not None
    assert nat.shape == py.shape == (24, 40, 3)
    np.testing.assert_array_equal(nat, py)


def test_hdr_rle_matches_python(native_lib, tmp_path):
    # new-style RLE: constant rows (runs) + varying rows (literals)
    w, h = 64, 8
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = 100
    rgbe[..., 1] = np.arange(w, dtype=np.uint8)[None, :]
    rgbe[..., 2] = 7
    rgbe[..., 3] = 130
    payload = b""
    for y in range(h):
        payload += bytes([2, 2, w >> 8, w & 0xFF])
        for c in range(4):
            col = rgbe[y, :, c]
            if (col == col[0]).all():
                payload += bytes([128 + w, int(col[0])])
            else:
                payload += bytes([w]) + col.tobytes()
    data = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
            + f"-Y {h} +X {w}\n".encode() + payload)
    p = str(tmp_path / "rle.hdr")
    with open(p, "wb") as f:
        f.write(data)
    py = load_hdr(p, allow_native=False)
    nat = native_lib.load_hdr(p)
    np.testing.assert_array_equal(nat, py)


def test_native_missing_file(native_lib):
    assert native_lib.parse_obj("/nonexistent/x.obj") is None
    assert native_lib.load_hdr("/nonexistent/x.hdr") is None
