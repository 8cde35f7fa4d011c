"""VTK-XML DataArray encoding matrix: every format VTK emits must decode.

Covers the reader branches not exercised by our own writer round-trips:
inline-base64 compressed, appended base64 (plain + compressed), and
multi-block compressed streams with both header types.
"""

import base64
import zlib

import numpy as np
import pytest

from cudadepthmapintegration_tpu.io.vti import read_vti


def _compressed_blocks(payload: bytes, header_dtype, block: int = 64):
    nblocks = max(1, -(-len(payload) // block))
    last = len(payload) - (nblocks - 1) * block
    chunks = [
        zlib.compress(payload[i * block : (i + 1) * block]) for i in range(nblocks)
    ]
    header = np.array(
        [nblocks, block, last] + [len(c) for c in chunks], dtype=header_dtype
    ).tobytes()
    return header, b"".join(chunks)


def _write_vti(tmp_path, data_xml: str, header_type="UInt32", compressor=False,
               appended: bytes | None = None, appended_encoding="raw"):
    comp = ' compressor="vtkZLibDataCompressor"' if compressor else ""
    app = ""
    if appended is not None:
        enc = f' encoding="{appended_encoding}"'
        body = appended if appended_encoding == "raw" else appended
        app = (
            f'  <AppendedData{enc}>\n_'.encode()
            + body
            + b"\n  </AppendedData>\n"
        )
    content = (
        f'<?xml version="1.0"?>\n'
        f'<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" '
        f'header_type="{header_type}"{comp}>\n'
        f'  <ImageData WholeExtent="0 3 0 1 0 0" Origin="0 0 0" Spacing="1 1 1">\n'
        f'    <Piece Extent="0 3 0 1 0 0">\n'
        f"      <PointData>\n{data_xml}      </PointData>\n"
        f"    </Piece>\n  </ImageData>\n"
    ).encode()
    if appended is not None:
        content += app if isinstance(app, bytes) else app.encode()
    content += b"</VTKFile>\n"
    p = tmp_path / "t.vti"
    p.write_bytes(content)
    return str(p)


DATA = np.arange(8, dtype=np.float64) * 1.5 - 3.0


@pytest.mark.parametrize("header_type,hdt", [("UInt32", np.uint32), ("UInt64", np.uint64)])
def test_inline_binary_compressed(tmp_path, header_type, hdt):
    payload = DATA.tobytes()
    header, blocks = _compressed_blocks(payload, hdt)
    # VTK quirk: header and block stream are base64-encoded SEPARATELY.
    blob = base64.b64encode(header).decode() + base64.b64encode(blocks).decode()
    xml = (
        f'        <DataArray type="Float64" Name="Depths" format="binary">'
        f"{blob}</DataArray>\n"
    )
    p = _write_vti(tmp_path, xml, header_type=header_type, compressor=True)
    img = read_vti(p)
    np.testing.assert_array_equal(img.point_data["Depths"], DATA)


@pytest.mark.parametrize("header_type,hdt", [("UInt32", np.uint32), ("UInt64", np.uint64)])
def test_appended_base64_plain(tmp_path, header_type, hdt):
    payload = DATA.tobytes()
    blob = (
        base64.b64encode(np.array([len(payload)], dtype=hdt).tobytes() + payload)
    )
    xml = (
        '        <DataArray type="Float64" Name="Depths" format="appended" '
        'offset="0"/>\n'
    )
    p = _write_vti(
        tmp_path, xml, header_type=header_type,
        appended=blob, appended_encoding="base64",
    )
    img = read_vti(p)
    np.testing.assert_array_equal(img.point_data["Depths"], DATA)


def test_appended_base64_compressed(tmp_path):
    payload = DATA.tobytes()
    header, blocks = _compressed_blocks(payload, np.uint32)
    blob = base64.b64encode(header) + base64.b64encode(blocks)
    xml = (
        '        <DataArray type="Float64" Name="Depths" format="appended" '
        'offset="0"/>\n'
    )
    p = _write_vti(
        tmp_path, xml, header_type="UInt32", compressor=True,
        appended=blob, appended_encoding="base64",
    )
    img = read_vti(p)
    np.testing.assert_array_equal(img.point_data["Depths"], DATA)


def test_appended_raw_multiple_arrays(tmp_path):
    a = DATA
    b = (DATA * 2).astype(np.float64)
    hdt = np.uint64
    pa, pb = a.tobytes(), b.tobytes()
    blob = (
        np.array([len(pa)], hdt).tobytes() + pa
        + np.array([len(pb)], hdt).tobytes() + pb
    )
    off_b = 8 + len(pa)
    xml = (
        '        <DataArray type="Float64" Name="Depths" format="appended" '
        'offset="0"/>\n'
        f'        <DataArray type="Float64" Name="Best Cost Values" '
        f'format="appended" offset="{off_b}"/>\n'
    )
    p = _write_vti(
        tmp_path, xml, header_type="UInt64",
        appended=blob, appended_encoding="raw",
    )
    img = read_vti(p)
    np.testing.assert_array_equal(img.point_data["Depths"], a)
    np.testing.assert_array_equal(img.point_data["Best Cost Values"], b)
