"""DDS container round-trip tests (io/dds.py)."""
import numpy as np

import gfx_imagecompress_tpu as gic
from gfx_imagecompress_tpu.io import dds

from conftest import gradient_rgba


def test_compressed_roundtrip(tmp_path):
    src = gradient_rgba(20, 36)
    out = gic.compress(gic.CompressType.DXBC3, gic.Image.from_array(src))
    p = str(tmp_path / "x.dds")
    dds.write_compressed(p, out)
    back = dds.read_compressed(p)
    assert back.format == gic.BlockFormat.BC3_UNORM
    assert (back.width, back.height, back.slices) == (36, 20, 1)
    np.testing.assert_array_equal(np.asarray(back.blocks),
                                  np.asarray(out.blocks))


def test_bc1_8byte_blocks(tmp_path):
    src = gradient_rgba(16, 16)
    out = gic.compress(gic.CompressType.DXBC1, gic.Image.from_array(src))
    p = str(tmp_path / "b.dds")
    dds.write_compressed(p, out)
    import os
    # 128-byte header + 20-byte DX10 + 16 blocks * 8 bytes
    assert os.path.getsize(p) == 128 + 20 + 16 * 8
    back = dds.read_compressed(p)
    np.testing.assert_array_equal(np.asarray(back.blocks),
                                  np.asarray(out.blocks))


def test_uncompressed_write(tmp_path):
    src = gradient_rgba(8, 8)
    p = str(tmp_path / "u.dds")
    dds.write_image(p, gic.Image.from_array(src), "rgba8")
    f = dds.read(p)
    assert (f.width, f.height) == (8, 8)
    assert f.dxgi_format == dds.DXGI_RGBA8
    arr = np.frombuffer(f.data, np.uint8).reshape(8, 8, 4)
    np.testing.assert_array_equal(
        arr, np.clip(np.round(src * 255), 0, 255).astype(np.uint8))
