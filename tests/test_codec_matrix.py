"""One test per row of README's codec support matrix.

VERDICT r8 task 6: the gate list was correct but scattered across codec
modules; README now carries a single container-mode × pixel-type ×
codec table, and THIS file pins every "raises" cell so the table can
never drift from the code. The "decodes here" cells are pinned by the
existing round-trip/e2e suites (test_zisraw.py, test_jpegcodec.py,
test_fixture_encodings.py); here we cover the refusal rows that had no
dedicated test: each JPEG flavor gate in sources/jpegcodec.py and the
ZISRAW pixel-type / JPEG-pixel gates in sources/zisraw.py.

Fixture strategy: encode a real baseline JPEG with the vendored encoder
and surgically patch ONE header field per test — the decoder must
refuse on exactly that field, proving the gate fires on the declared
condition and not on some coincidental malformation.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aind_hcr_data_transformation_spark.sources.jpegcodec import (
    decode_gray,
    encode_gray,
)


def _img() -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(16, 24), dtype=np.uint8)


def _segments(data: bytes):
    """Yield (marker, seg_start, body_start, body_len) for each
    marker segment up to and including SOS."""
    assert data[:2] == b"\xff\xd8"
    pos = 2
    while pos < len(data):
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        if marker == 0xD9:
            return
        length = struct.unpack_from(">H", data, pos + 2)[0]
        yield marker, pos, pos + 4, length - 2
        if marker == 0xDA:
            return
        pos += 2 + length


def _patch(data: bytes, marker: int, body_offset: int, value: int) -> bytes:
    for m, _seg, body, _n in _segments(data):
        if m == marker:
            b = bytearray(data)
            b[body + body_offset] = value
            return bytes(b)
    raise AssertionError(f"marker FF{marker:02X} not found")


def test_baseline_gray8_decodes():
    """The one 'decodes here' JPEG row, for completeness of the matrix."""
    img = _img()
    out = decode_gray(encode_gray(img, quality=100))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_12bit_precision_gates():
    # SOF0 body: precision(1) height(2) width(2) nf(1)
    data = _patch(encode_gray(_img()), 0xC0, 0, 12)
    with pytest.raises(NotImplementedError, match="12-bit JPEG"):
        decode_gray(data)


def test_multi_component_gates():
    data = _patch(encode_gray(_img()), 0xC0, 5, 3)
    with pytest.raises(NotImplementedError, match="3-component JPEG"):
        decode_gray(data)


def test_subsampled_gates():
    # component spec: id(1) HV(1) tq(1) at body offsets 6..8
    data = _patch(encode_gray(_img()), 0xC0, 7, 0x22)
    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_gray(data)


def test_16bit_quant_table_gates():
    # DQT body: pq/tq nibble byte first; pq=1 means 16-bit table
    data = _patch(encode_gray(_img()), 0xDB, 0, 0x10)
    with pytest.raises(NotImplementedError, match="16-bit quantization"):
        decode_gray(data)


def test_restart_interval_gates():
    # splice a DRI segment (FFDD, len 4, interval 8) in front of SOS
    data = encode_gray(_img())
    for m, seg, _body, _n in _segments(data):
        if m == 0xDA:
            dri = b"\xff\xdd\x00\x04\x00\x08"
            data = data[:seg] + dri + data[seg:]
            break
    with pytest.raises(NotImplementedError, match="restart intervals"):
        decode_gray(data)


def test_zero_restart_interval_is_inert():
    """DRI with interval 0 disables restarts per T.81 — it must decode,
    proving the gate reads the interval, not the marker's presence."""
    img = _img()
    data = encode_gray(img, quality=100)
    for m, seg, _body, _n in _segments(data):
        if m == 0xDA:
            dri = b"\xff\xdd\x00\x04\x00\x00"
            data = data[:seg] + dri + data[seg:]
            break
    out = decode_gray(data)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


# --- ZISRAW container gates ------------------------------------------------


def _plain_entry(tmp_path):
    from tests.test_zisraw import synthetic_ramp_block  # shared fixture gen

    from aind_hcr_data_transformation_spark.sources.zisraw import (
        MiniCziFile,
        write_czi,
    )

    planes = {0: synthetic_ramp_block(0, 1, 0, 32, 0, 48)[0]}
    path = str(tmp_path / "plain.czi")
    write_czi(path, planes)
    with MiniCziFile(path) as czi:
        return czi.filtered_subblock_directory[0]


def test_zisraw_jpeg_non_gray8_gates(tmp_path):
    """Mode 1 (baseline JPEG) is defined for gray8 only: a 16-bit pixel
    type behind compression=1 must refuse before touching payload."""
    from aind_hcr_data_transformation_spark.sources.zisraw import (
        SubBlockEntry,
    )

    e = _plain_entry(tmp_path)
    jpeg16 = SubBlockEntry(
        1, e.file_position, 1, e.pyramid_type, e.dimensions, e._path
    )
    with pytest.raises(NotImplementedError, match="non-gray8"):
        jpeg16.data()


def test_zisraw_unknown_pixel_type_gates(tmp_path):
    from aind_hcr_data_transformation_spark.sources.zisraw import (
        SubBlockEntry,
    )

    e = _plain_entry(tmp_path)
    weird = SubBlockEntry(
        99, e.file_position, 0, e.pyramid_type, e.dimensions, e._path
    )
    with pytest.raises(NotImplementedError, match="pixel type 99"):
        weird.data()
