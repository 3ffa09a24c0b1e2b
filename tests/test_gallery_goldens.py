"""Visual-golden regression gate: the committed capture gallery must stay
pose-matched to the reference screenshots.

examples/render_gallery.py renders every scene at the reference capture
settings using NCC-fitted poses (examples/fit_poses.py) and records
masked luminance NCC + means against /root/reference/captures/N-04-1.png
(window chrome cropped, ImGui panel masked — see render_gallery.py).
This test pins the committed gallery.json to per-scene floors a little
under the achieved values, so a regression in geometry, materials, pose
handling, or the comparison itself fails CI instead of silently decaying
back to the round-2 noise (NCC ~0, negative for colonnes).

Floors reflect measured achievable values at 256 spp: near-unity for
the Cornell boxes, lower where the capture's trackball pose includes
components outside the fit's reach. Round 5's joint dolly stage
(fov refined together with zoom/orbit/pan — a trackball dolly moves
them all at once) closed the last gap: colonnes 0.692 -> 0.726
(yaw -40, fov 0.846), so every captured scene now clears 0.70
(round-3 "done" bar) — box_diffuse 0.969, box_balls 0.985, menger
0.827, box_no_top 0.761, materials 0.707, 4boules 0.919,
menger_lights 0.831, colonnes 0.726.
"""
import json
import os

import pytest

GALLERY = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "captures", "gallery.json")

# (ncc floor, |luma mean diff| ceiling) per reference-captured scene
FLOORS = {
    "box_diffuse": (0.93, 0.05),
    "box_balls": (0.93, 0.05),
    "menger": (0.78, 0.05),
    "box_no_top": (0.72, 0.05),
    "materials": (0.67, 0.06),
    "4boules": (0.87, 0.05),
    "menger_lights": (0.78, 0.05),
    "colonnes": (0.68, 0.10),
}


@pytest.fixture(scope="module")
def gallery():
    if not os.path.exists(GALLERY):
        pytest.skip("no committed gallery.json")
    with open(GALLERY) as f:
        return json.load(f)


def test_every_captured_scene_present(gallery):
    for name in FLOORS:
        assert name in gallery["scenes"], name
        assert "luma_ncc" in gallery["scenes"][name], (
            f"{name} has no reference comparison")


def test_ncc_floors(gallery):
    bad = {}
    for name, (ncc_floor, _) in FLOORS.items():
        got = gallery["scenes"][name].get("luma_ncc", -1.0)
        if got < ncc_floor:
            bad[name] = (got, ncc_floor)
    assert not bad, f"gallery NCC below floor: {bad}"


def test_luma_mean_tracks_reference(gallery):
    bad = {}
    for name, (_, dmean_max) in FLOORS.items():
        e = gallery["scenes"][name]
        d = abs(e["ref_luma_mean"] - e["our_luma_mean"])
        if d > dmean_max:
            bad[name] = (round(d, 4), dmean_max)
    assert not bad, f"gallery luminance mean drift: {bad}"
