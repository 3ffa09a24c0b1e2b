"""DrawSampling visualizer: cloud statistics + carousel + PNG output."""
import os

import numpy as np

from montecarlo_pathtracing_tpu.models.draw_sampling import (
    sample_cloud, render_cloud, save_sampling_png, SAMPLERS)


def test_cloud_concentrates_with_low_roughness():
    n = (0.0, 0.0, 1.0)
    tight = np.asarray(sample_cloud(2000, n, 0.1))
    wide = np.asarray(sample_cloud(2000, n, 1.0))
    assert tight[:, 2].mean() > wide[:, 2].mean() + 0.1


def test_cloud_oriented_about_normal():
    nrm = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    pts = np.asarray(sample_cloud(2000, nrm, 0.5))
    assert (pts @ nrm > 0).mean() > 0.999


def test_wrong_samplers_visibly_differ():
    n = (0.0, 0.0, 1.0)
    good = np.asarray(sample_cloud(2000, n, 1.0, "hsphere"))
    w1 = np.asarray(sample_cloud(2000, n, 1.0, "hsphere_wrong"))
    w2 = np.asarray(sample_cloud(2000, n, 1.0, "hsphere_wrong2"))
    assert (w1 >= 0).all()               # positive-octant artifact
    assert (w2[:, 2] < 0).mean() > 0.3   # full sphere, not hemisphere
    assert not (good >= 0).all()


def test_png_output(tmp_path):
    for name in SAMPLERS:
        p = str(tmp_path / f"{name}.png")
        pts = save_sampling_png(p, n_samples=500, sampler=name)
        assert os.path.exists(p) and os.path.getsize(p) > 500
        assert pts.shape == (500, 3)


def test_render_cloud_marks_pixels():
    pts = np.asarray(sample_cloud(1000, (0, 0, 1), 0.8))
    img = render_cloud(pts, 128, 128)
    assert (img.sum(-1) > 0).sum() > 200
