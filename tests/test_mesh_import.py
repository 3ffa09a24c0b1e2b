"""Mesh importers (OBJ / PLY / STL / glTF+GLB) — round-trip tests.

The reference imports arbitrary formats through Assimp with triangulation
and smooth normals (easycppogl/mesh.cpp:646-750); here each dependency-
free parser is checked by writing a known mesh in that format and
comparing the loaded triangle soup geometrically (corner multisets match
regardless of vertex order / welding)."""
import base64
import json
import struct

import numpy as np
import pytest

from montecarlo_pathtracing_tpu.scene import mesh as M


def _soup(geom):
    """Canonical triangle soup: sorted [T, 9] corner rows."""
    v, t = geom.vertices, geom.triangles
    tri = np.concatenate([v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]], axis=1)
    tri = np.sort(tri.reshape(-1, 3, 3), axis=1).reshape(-1, 9)
    return tri[np.lexsort(tri.T[::-1])]


@pytest.fixture
def ref_mesh():
    return M.cube()


def test_load_obj_roundtrip(tmp_path, ref_mesh):
    p = tmp_path / "m.obj"
    with open(p, "w") as f:
        for v in ref_mesh.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in ref_mesh.triangles:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
    got = M.load_obj(str(p))
    np.testing.assert_allclose(_soup(got), _soup(ref_mesh), atol=1e-6)
    assert np.allclose(np.linalg.norm(got.normals, axis=1), 1.0, atol=1e-5)


def test_load_stl_binary_roundtrip(tmp_path, ref_mesh):
    p = tmp_path / "m.stl"
    v, t = ref_mesh.vertices, ref_mesh.triangles
    with open(p, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(t)))
        for a, b, c in t:
            f.write(struct.pack("<3f", 0, 0, 0))
            for vi in (a, b, c):
                f.write(struct.pack("<3f", *v[vi]))
            f.write(struct.pack("<H", 0))
    got = M.load_stl(str(p))
    np.testing.assert_allclose(_soup(got), _soup(ref_mesh), atol=1e-6)
    # welding must reconnect the soup: a cube has exactly 8 vertices
    assert got.vertices.shape[0] == 8


def test_load_stl_ascii_roundtrip(tmp_path, ref_mesh):
    p = tmp_path / "m.stl"
    v, t = ref_mesh.vertices, ref_mesh.triangles
    with open(p, "w") as f:
        f.write("solid cube\n")
        for a, b, c in t:
            f.write(" facet normal 0 0 0\n  outer loop\n")
            for vi in (a, b, c):
                f.write(f"   vertex {v[vi][0]} {v[vi][1]} {v[vi][2]}\n")
            f.write("  endloop\n endfacet\n")
        f.write("endsolid cube\n")
    got = M.load_stl(str(p))
    np.testing.assert_allclose(_soup(got), _soup(ref_mesh), atol=1e-6)


def _gltf_dict(ref_mesh, scale):
    v = ref_mesh.vertices.astype(np.float32)
    idx = ref_mesh.triangles.astype(np.uint32).reshape(-1)
    raw = v.tobytes() + idx.tobytes()
    return {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "scale": [scale] * 3}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(v),
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5125, "count": len(idx),
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": v.nbytes},
            {"buffer": 0, "byteOffset": v.nbytes,
             "byteLength": idx.nbytes},
        ],
        "buffers": [{"byteLength": len(raw)}],
    }, raw


def test_load_gltf_data_uri(tmp_path, ref_mesh):
    doc, raw = _gltf_dict(ref_mesh, scale=2.0)
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64,"
        + base64.b64encode(raw).decode())
    p = tmp_path / "m.gltf"
    with open(p, "w") as f:
        json.dump(doc, f)
    got = M.load_gltf(str(p))
    scaled = M.MeshGeometry(ref_mesh.vertices * 2.0, ref_mesh.normals,
                            ref_mesh.triangles)
    np.testing.assert_allclose(_soup(got), _soup(scaled), atol=1e-5)


def test_load_glb(tmp_path, ref_mesh):
    doc, raw = _gltf_dict(ref_mesh, scale=1.0)
    js = json.dumps(doc).encode()
    js += b" " * (-len(js) % 4)
    raw += b"\0" * (-len(raw) % 4)
    body = (struct.pack("<II", len(js), 0x4E4F534A) + js
            + struct.pack("<II", len(raw), 0x004E4942) + raw)
    p = tmp_path / "m.glb"
    with open(p, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, 12 + len(body)))
        f.write(body)
    got = M.load_mesh(str(p))
    np.testing.assert_allclose(_soup(got), _soup(ref_mesh), atol=1e-6)


def test_load_mesh_dispatch_unknown(tmp_path):
    with pytest.raises(ValueError):
        M.load_mesh(str(tmp_path / "m.xyz"))
