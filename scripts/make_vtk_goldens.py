"""Generate the vendored VTK-writer golden fixtures (tests/golden/).

PROVENANCE: this environment has no VTK build, so these files are
hand-authored byte layouts reproducing what VTK's writers emit —
element/attribute order, indentation, RangeMin/RangeMax decoration,
version/header_type pairings, the separately-base64'd compression header,
MetaImage's full key set — as specified by VTK/IO/XML writer sources and
checked against the documented format (docs.vtk.org VTK file formats).
They exercise layout variants OUR writers never produce, which is the
interop risk being tested. If a real VTK build becomes available, rerun
its writers over the same arrays and drop the outputs in place; the test
(tests/test_vtk_goldens.py) pins array VALUES, so byte-level replacement
is safe.

Deterministic: same bytes on every run (seeded data, fixed zlib level).
"""

import base64
import os
import struct
import sys
import zlib

import numpy as np

sys.path.insert(0, ".")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")


def golden_arrays():
    """The reference-shaped point arrays all fixtures carry (8x6 image)."""
    rng = np.random.default_rng(20260817)
    depths = np.round(rng.uniform(0.5, 5.0, (6, 8)), 4)
    depths[1, 3] = -1.0
    best = np.round(rng.uniform(0.0, 1.0, (6, 8)), 4)
    color = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    return depths, best, color


def _rng_attrs(a):
    return f'RangeMin="{a.min():.6g}"' + " " + f'RangeMax="{a.max():.6g}"'


def _zlib_blocks(data: bytes, header_fmt: str, block_size: int = 32768):
    """VTK vtkZLibDataCompressor block stream + header ints."""
    blocks = [data[i : i + block_size] for i in range(0, len(data), block_size)]
    comp = [zlib.compress(b, 6) for b in blocks]
    last = len(blocks[-1]) if blocks else 0
    header = struct.pack(
        "<" + header_fmt * (3 + len(comp)),
        len(comp), block_size, last, *[len(c) for c in comp],
    )
    return header, b"".join(comp)


def write_vti_v10_uint64_zlib_appended_raw(path):
    """Modern VTK (9.x) default-ish: version 1.0, UInt64 headers, zlib,
    appended raw. Array big enough to force TWO compression blocks."""
    depths, best, color = golden_arrays()
    # A large Float64 filler array (> 32768 B) forces multi-block zlib.
    filler = np.linspace(0.0, 1.0, 6000)

    payload = bytearray()
    offsets = []
    for arr in (depths, best, color, filler):
        data = np.ascontiguousarray(arr).tobytes()
        header, comp = _zlib_blocks(data, "Q")
        offsets.append(len(payload))
        payload += header + comp

    xml = f"""<?xml version="1.0"?>
<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" header_type="UInt64" compressor="vtkZLibDataCompressor">
  <ImageData WholeExtent="0 7 0 5 0 0" Origin="0 0 0" Spacing="1 1 1" Direction="1 0 0 0 1 0 0 0 1">
    <Piece Extent="0 7 0 5 0 0">
      <PointData Scalars="Depths">
        <DataArray type="Float64" Name="Depths" format="appended" {_rng_attrs(depths)} offset="{offsets[0]}"/>
        <DataArray type="Float64" Name="Best Cost Values" format="appended" {_rng_attrs(best)} offset="{offsets[1]}"/>
        <DataArray type="UInt8" Name="Color" NumberOfComponents="3" format="appended" RangeMin="0" RangeMax="255" offset="{offsets[2]}"/>
        <DataArray type="Float64" Name="Filler" format="appended" {_rng_attrs(filler)} offset="{offsets[3]}"/>
      </PointData>
      <CellData>
      </CellData>
    </Piece>
  </ImageData>
  <AppendedData encoding="raw">
   _"""
    with open(path, "wb") as f:
        f.write(xml.encode())
        f.write(bytes(payload))
        f.write(b"\n  </AppendedData>\n</VTKFile>\n")


def write_vti_v01_uint32_appended_raw(path):
    """Legacy VTK (6/7, the reference's era): version 0.1, implicit UInt32
    headers (no header_type attribute), uncompressed appended raw."""
    depths, best, color = golden_arrays()
    payload = bytearray()
    offsets = []
    for arr in (depths, best, color):
        data = np.ascontiguousarray(arr).tobytes()
        offsets.append(len(payload))
        payload += struct.pack("<I", len(data)) + data

    xml = f"""<?xml version="1.0"?>
<VTKFile type="ImageData" version="0.1" byte_order="LittleEndian">
  <ImageData WholeExtent="0 7 0 5 0 0" Origin="0 0 0" Spacing="1 1 1">
    <Piece Extent="0 7 0 5 0 0">
      <PointData Scalars="Depths">
        <DataArray type="Float64" Name="Depths" format="appended" offset="{offsets[0]}"/>
        <DataArray type="Float64" Name="Best Cost Values" format="appended" offset="{offsets[1]}"/>
        <DataArray type="UInt8" Name="Color" NumberOfComponents="3" format="appended" offset="{offsets[2]}"/>
      </PointData>
      <CellData>
      </CellData>
    </Piece>
  </ImageData>
  <AppendedData encoding="raw">
   _"""
    with open(path, "wb") as f:
        f.write(xml.encode())
        f.write(bytes(payload))
        f.write(b"\n  </AppendedData>\n</VTKFile>\n")


def write_vti_inline_b64_zlib(path):
    """Inline binary + zlib: the header is base64'd SEPARATELY from the
    block stream (the VTK inline-compression quirk)."""
    depths, best, color = golden_arrays()

    def encode(arr):
        data = np.ascontiguousarray(arr).tobytes()
        header, comp = _zlib_blocks(data, "I")
        return base64.b64encode(header).decode() + base64.b64encode(comp).decode()

    xml = f"""<?xml version="1.0"?>
<VTKFile type="ImageData" version="0.1" byte_order="LittleEndian" compressor="vtkZLibDataCompressor">
  <ImageData WholeExtent="0 7 0 5 0 0" Origin="0 0 0" Spacing="1 1 1">
    <Piece Extent="0 7 0 5 0 0">
      <PointData Scalars="Depths">
        <DataArray type="Float64" Name="Depths" format="binary">
          {encode(depths)}
        </DataArray>
        <DataArray type="Float64" Name="Best Cost Values" format="binary">
          {encode(best)}
        </DataArray>
        <DataArray type="UInt8" Name="Color" NumberOfComponents="3" format="binary">
          {encode(color)}
        </DataArray>
      </PointData>
      <CellData>
      </CellData>
    </Piece>
  </ImageData>
</VTKFile>
"""
    with open(path, "wb") as f:
        f.write(xml.encode())


def golden_mesh():
    pts = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.5],
         [1.0, 1.0, 1.0]]
    )
    tris = np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4]], np.int64)
    return pts, tris


def write_vtp_ascii(path):
    """vtkXMLPolyDataWriter ascii layout: counts in Piece attrs, Float32
    points, Int64 connectivity/offsets, wrapped ascii values."""
    pts, tris = golden_mesh()
    pts32 = pts.astype(np.float32)

    def ascii_rows(a, per_line):
        flat = np.asarray(a).reshape(-1)
        fmt = (lambda x: f"{x:.6g}") if flat.dtype.kind == "f" else str
        lines = []
        for i in range(0, len(flat), per_line):
            lines.append(" ".join(fmt(v) for v in flat[i : i + per_line]))
        return ("\n" + " " * 10).join(lines)

    offsets = np.arange(1, len(tris) + 1) * 3
    xml = f"""<?xml version="1.0"?>
<VTKFile type="PolyData" version="1.0" byte_order="LittleEndian" header_type="UInt64">
  <PolyData>
    <Piece NumberOfPoints="{len(pts)}" NumberOfVerts="0" NumberOfLines="0" NumberOfStrips="0" NumberOfPolys="{len(tris)}">
      <PointData>
      </PointData>
      <CellData>
      </CellData>
      <Points>
        <DataArray type="Float32" Name="Points" NumberOfComponents="3" format="ascii" {_rng_attrs(pts32)}>
          {ascii_rows(pts32, 6)}
        </DataArray>
      </Points>
      <Verts>
        <DataArray type="Int64" Name="connectivity" format="ascii" RangeMin="1e+299" RangeMax="-1e+299">
        </DataArray>
        <DataArray type="Int64" Name="offsets" format="ascii" RangeMin="1e+299" RangeMax="-1e+299">
        </DataArray>
      </Verts>
      <Polys>
        <DataArray type="Int64" Name="connectivity" format="ascii" RangeMin="0" RangeMax="{int(tris.max())}">
          {ascii_rows(tris, 9)}
        </DataArray>
        <DataArray type="Int64" Name="offsets" format="ascii" RangeMin="3" RangeMax="{int(offsets[-1])}">
          {ascii_rows(offsets, 9)}
        </DataArray>
      </Polys>
    </Piece>
  </PolyData>
</VTKFile>
"""
    with open(path, "wb") as f:
        f.write(xml.encode())


def write_vtp_appended_b64_zlib(path):
    """Appended data with encoding="base64" + zlib + colored point data
    (the Coloration output shape: MeanColoration etc.)."""
    pts, tris = golden_mesh()
    mean = np.array([[10, 20, 30]] * len(pts), np.uint8)
    count = np.arange(len(pts), dtype=np.int32)

    payload = ""
    offsets = []
    for arr in (pts.astype(np.float32), mean, count,
                tris.astype(np.int64), (np.arange(1, 4) * 3).astype(np.int64)):
        data = np.ascontiguousarray(arr).tobytes()
        header, comp = _zlib_blocks(data, "I")
        offsets.append(len(payload))
        payload += (base64.b64encode(header).decode()
                    + base64.b64encode(comp).decode())

    xml = f"""<?xml version="1.0"?>
<VTKFile type="PolyData" version="0.1" byte_order="LittleEndian" compressor="vtkZLibDataCompressor">
  <PolyData>
    <Piece NumberOfPoints="{len(pts)}" NumberOfVerts="0" NumberOfLines="0" NumberOfStrips="0" NumberOfPolys="{len(tris)}">
      <PointData>
        <DataArray type="UInt8" Name="MeanColoration" NumberOfComponents="3" format="appended" offset="{offsets[1]}"/>
        <DataArray type="Int32" Name="NbProjectedDepthMap" format="appended" offset="{offsets[2]}"/>
      </PointData>
      <CellData>
      </CellData>
      <Points>
        <DataArray type="Float32" Name="Points" NumberOfComponents="3" format="appended" offset="{offsets[0]}"/>
      </Points>
      <Polys>
        <DataArray type="Int64" Name="connectivity" format="appended" offset="{offsets[3]}"/>
        <DataArray type="Int64" Name="offsets" format="appended" offset="{offsets[4]}"/>
      </Polys>
    </Piece>
  </PolyData>
  <AppendedData encoding="base64">
   _{payload}
  </AppendedData>
</VTKFile>
"""
    with open(path, "wb") as f:
        f.write(xml.encode())


def write_mha_compressed(path):
    """vtkMetaImageWriter layout with the full key set + zlib payload."""
    vol = np.arange(8 * 6 * 4, dtype=np.float64).reshape(4, 6, 8) * 0.25
    comp = zlib.compress(np.ascontiguousarray(vol).tobytes(), 6)
    header = (
        "ObjectType = Image\n"
        "NDims = 3\n"
        "BinaryData = True\n"
        "BinaryDataByteOrderMSB = False\n"
        "CompressedData = True\n"
        f"CompressedDataSize = {len(comp)}\n"
        "TransformMatrix = 1 0 0 0 1 0 0 0 1\n"
        "Offset = -1.6 -1.6 -1.6\n"
        "CenterOfRotation = 0 0 0\n"
        "AnatomicalOrientation = RAI\n"
        "ElementSpacing = 0.2 0.2 0.2\n"
        "DimSize = 8 6 4\n"
        "ElementType = MET_DOUBLE\n"
        "ElementDataFile = LOCAL\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(comp)


def main():
    os.makedirs(OUT, exist_ok=True)
    write_vti_v10_uint64_zlib_appended_raw(
        os.path.join(OUT, "vtk9_uint64_zlib_appended.vti"))
    write_vti_v01_uint32_appended_raw(
        os.path.join(OUT, "vtk6_uint32_appended.vti"))
    write_vti_inline_b64_zlib(os.path.join(OUT, "vtk_inline_b64_zlib.vti"))
    write_vtp_ascii(os.path.join(OUT, "vtk9_ascii.vtp"))
    write_vtp_appended_b64_zlib(os.path.join(OUT, "vtk_appended_b64_zlib.vtp"))
    write_mha_compressed(os.path.join(OUT, "vtk_compressed.mha"))
    for name in sorted(os.listdir(OUT)):
        print(name, os.path.getsize(os.path.join(OUT, name)))


if __name__ == "__main__":
    main()
