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
    encode_gray12,
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


def _img12() -> np.ndarray:
    rng = np.random.default_rng(11)
    return rng.integers(0, 4096, size=(16, 24), dtype=np.uint16)


def test_12bit_sof1_decodes():
    """12-bit extended sequential (SOF1) — the microscopy camera depth —
    round-trips through the vendored codec as uint16."""
    img = _img12()
    out = decode_gray(encode_gray12(img, quality=100))
    assert out.dtype == np.uint16
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_12bit_in_baseline_frame_rejected():
    """SOF0 is 8-bit by definition: a baseline frame header claiming
    12-bit precision is malformed, not a supported flavor."""
    # SOF0 body: precision(1) height(2) width(2) nf(1)
    data = _patch(encode_gray(_img()), 0xC0, 0, 12)
    with pytest.raises(ValueError, match="BASELINE"):
        decode_gray(data)


def test_unsupported_precision_gates():
    data = _patch(encode_gray12(_img12()), 0xC1, 0, 10)
    with pytest.raises(NotImplementedError, match="10-bit JPEG"):
        decode_gray(data)


def test_multi_component_routes_to_decode_image():
    """decode_gray stays the 1-component CZI API: a real 3-component
    stream is refused with a pointer to decode_image, which decodes it
    (r10: the multi-component matrix row flipped to 'decodes here' —
    round-trip pins live in tests/test_jpeg_color.py)."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
        encode_color,
    )

    rgb = np.stack([_img(), _img(), _img()], axis=-1)
    data = encode_color(rgb, quality=90)
    with pytest.raises(NotImplementedError, match="decode_image"):
        decode_gray(data)
    assert decode_image(data).shape == (*rgb.shape[:2], 3)


def test_multi_component_count_claim_without_specs_is_malformed():
    """The old gate fixture — a 1-component stream whose SOF merely
    CLAIMS Nf=3 — is malformed (missing two component specs) and must
    fail loudly in the general decoder, not decode garbage."""
    from aind_hcr_data_transformation_spark.sources.jpegcodec import (
        decode_image,
    )

    data = _patch(encode_gray(_img()), 0xC0, 5, 3)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(data)


def test_subsampling_factors_inert_in_single_component_frame():
    """T.81 A.2.4: a single-component frame's dims equal the frame dims
    whatever its sampling factors, and non-interleaved scans ignore
    them — HV=0x22 must decode identically to HV=0x11 (r10: the
    'subsampled raises' row removed; multi-component subsampling pins
    live in tests/test_jpeg_color.py)."""
    base = encode_gray(_img(), quality=100)
    patched = _patch(base, 0xC0, 7, 0x22)
    np.testing.assert_array_equal(decode_gray(patched), decode_gray(base))


def test_16bit_quant_table_decodes():
    """Pq=1 (16-bit DQT entries) decodes: rebuild the DQT segment of a
    real stream with the same table widened to 16-bit — the pixels must
    come out identical to the 8-bit-table original."""
    data = encode_gray(_img(), quality=100)
    for m, seg, body, n in _segments(data):
        if m == 0xDB:
            tbl8 = data[body + 1 : body + 1 + 64]
            wide = bytes([0x10]) + struct.pack(">64H", *tbl8)
            new_seg = b"\xff\xdb" + struct.pack(">H", len(wide) + 2) + wide
            patched = data[:seg] + new_seg + data[seg + 4 + n :]
            break
    np.testing.assert_array_equal(decode_gray(patched), decode_gray(data))


def test_invalid_quant_precision_gates():
    data = _patch(encode_gray(_img()), 0xDB, 0, 0x20)  # Pq=2: undefined
    with pytest.raises(ValueError, match="Pq=2"):
        decode_gray(data)


def test_restart_intervals_decode():
    """DRI + RSTn streams decode bit-identically to their no-restart
    twin (8- and 12-bit), and a restart marker out of modulo sequence
    raises — the gate verifies the sequence, not just the syntax."""
    img = _img()
    plain = decode_gray(encode_gray(img, quality=100))
    with_rst = encode_gray(img, quality=100, restart_interval=2)
    np.testing.assert_array_equal(decode_gray(with_rst), plain)
    img12 = _img12()
    np.testing.assert_array_equal(
        decode_gray(encode_gray12(img12, quality=100, restart_interval=3)),
        decode_gray(encode_gray12(img12, quality=100)),
    )
    # corrupt the first RST id (FFD0 -> FFD5): out-of-sequence must raise
    first = with_rst.find(b"\xff\xd0")
    assert first > 0, "fixture must contain a restart marker"
    corrupted = with_rst[:first] + b"\xff\xd5" + with_rst[first + 2 :]
    with pytest.raises(ValueError, match="out of sequence"):
        decode_gray(corrupted)


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


def test_zisraw_jpeg_float_pixels_gate(tmp_path):
    """Mode 1 (JPEG) covers integer gray8/gray16 only: a float32 pixel
    type behind compression=1 must refuse before touching payload."""
    from aind_hcr_data_transformation_spark.sources.zisraw import (
        SubBlockEntry,
    )

    e = _plain_entry(tmp_path)
    jpegf = SubBlockEntry(
        4, e.file_position, 1, e.pyramid_type, e.dimensions, e._path
    )
    with pytest.raises(NotImplementedError, match="non-integer-gray"):
        jpegf.data()


def test_zisraw_jpeg_gray16_roundtrips(tmp_path):
    """Mode 1 + gray16 pixel type: 12-bit SOF1 payloads decode through
    the container within the documented quality-100 bound."""
    from aind_hcr_data_transformation_spark.sources.zisraw import (
        MiniCziFile,
        write_czi,
    )

    rng = np.random.default_rng(3)
    plane = rng.integers(0, 4096, size=(32, 48), dtype=np.uint16)
    path = str(tmp_path / "jpeg12.czi")
    write_czi(path, {0: plane}, compression=1)
    with MiniCziFile(path) as czi:
        got = czi.filtered_subblock_directory[0].data().reshape(plane.shape)
    assert got.dtype == np.uint16
    assert int(np.abs(got.astype(int) - plane.astype(int)).max()) <= 2


def test_zisraw_jpeg_precision_pixeltype_mismatch_gates(tmp_path):
    """An 8-bit scan under a gray16 directory entry (or vice versa) must
    raise: silently widening would shift intensities."""
    from aind_hcr_data_transformation_spark.sources.zisraw import (
        MiniCziFile,
        SubBlockEntry,
        write_czi,
    )

    plane = np.arange(32 * 48, dtype=np.uint8).reshape(32, 48) % 251
    path = str(tmp_path / "jpeg8.czi")
    write_czi(path, {0: plane}, compression=1)
    with MiniCziFile(path) as czi:
        e = czi.filtered_subblock_directory[0]
    lying = SubBlockEntry(
        1, e.file_position, 1, e.pyramid_type, e.dimensions, e._path
    )
    with pytest.raises(ValueError, match="decoded to uint8"):
        lying.data()


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
