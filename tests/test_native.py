"""Native (C++) data-path codec vs the pure-Python oracle.

The native library is compiled on first use from
instantsplat_tpu/native/exr_native.cpp; every entry point keeps a
pure-Python fallback in data/exr.py, which doubles as the byte-exactness
oracle here. Skips (never fails) when no C++ toolchain is available.
"""

import numpy as np
import pytest

from instantsplat_tpu import native
from instantsplat_tpu.data.exr import read_exr, write_exr


def _native_or_skip():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain / native lib unavailable")
    return lib


def _read_pure_python(path, monkeypatch):
    """Force the pure-Python block decoder for the same file."""
    import instantsplat_tpu.native as n

    monkeypatch.setattr(n, "_lib", None)
    monkeypatch.setattr(n, "_lib_failed", True)
    try:
        return read_exr(path)
    finally:
        monkeypatch.setattr(n, "_lib_failed", False)


@pytest.mark.parametrize("comp", ["none", "zips", "zip"])
@pytest.mark.parametrize("half", [False, True])
def test_native_exr_matches_oracle(tmp_path, monkeypatch, comp, half):
    _native_or_skip()
    rng = np.random.default_rng(42)
    # odd sizes + >16 rows so ZIP gets full and partial 16-row blocks
    img = (rng.random((37, 53)) * 100 - 50).astype(np.float32)
    p = tmp_path / f"x_{comp}_{half}.exr"
    write_exr(p, img, compression=comp, half=half)
    got = read_exr(p)
    ref = _read_pure_python(p, monkeypatch)
    assert got.dtype == ref.dtype and got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_native_exr_multichannel_and_incompressible(tmp_path, monkeypatch):
    _native_or_skip()
    rng = np.random.default_rng(7)
    # high-entropy floats: zlib loses on some blocks -> exercises the
    # stored-raw branch inside compressed files
    rgb = rng.standard_normal((45, 31, 3)).astype(np.float32) * 1e8
    p = tmp_path / "rgb.exr"
    write_exr(p, rgb, compression="zip")
    got = read_exr(p)
    ref = _read_pure_python(p, monkeypatch)
    assert np.array_equal(got, ref)
    assert got.shape == (45, 31, 3)


def test_native_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("INSTANTSPLAT_NO_NATIVE", "1")
    assert native.get_lib() is None
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = tmp_path / "f.exr"
    write_exr(p, img)
    assert np.array_equal(read_exr(p), img)  # pure-Python path still works


def test_rejects_out_of_window_block_y(tmp_path, monkeypatch):
    """A block whose scanline y lies outside the data window must raise in
    BOTH decoders (the native side would otherwise memcpy before the
    output planes — untrusted file bytes)."""
    import struct as st

    from instantsplat_tpu.data import exr as exr_mod

    img = np.ones((20, 20), np.float32)
    p = tmp_path / "y.exr"
    write_exr(p, img, compression="zip")  # 20 rows / 16 lpb -> 2 blocks
    buf = bytearray(p.read_bytes())
    off = 8
    while True:  # walk header attributes to the offset table
        name, off = exr_mod._read_cstr(buf, off)
        if not name:
            break
        _, off = exr_mod._read_cstr(buf, off)
        (size,) = st.unpack_from("<i", bytes(buf), off)
        off += 4 + size
    off += 8 * 2  # skip the 2-entry scanline offset table
    assert st.unpack_from("<i", bytes(buf), off)[0] == 0  # first block y
    st.pack_into("<i", buf, off, -16)  # y below the data window
    p.write_bytes(bytes(buf))
    if native.get_lib() is not None:
        with pytest.raises((RuntimeError, ValueError)):
            read_exr(p)
    with pytest.raises((RuntimeError, ValueError)):
        _read_pure_python(p, monkeypatch)


def test_native_rejects_corrupt_blocks(tmp_path):
    _native_or_skip()
    img = np.ones((20, 20), np.float32)
    p = tmp_path / "c.exr"
    write_exr(p, img, compression="zip")
    data = bytearray(p.read_bytes())
    data[-30:] = b"\x00" * 30  # clobber the final block payload
    p.write_bytes(bytes(data))
    with pytest.raises((RuntimeError, ValueError)):
        read_exr(p)
