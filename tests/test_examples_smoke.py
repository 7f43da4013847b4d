"""End-to-end smoke runs of the training example scripts at tiny
configurations (the reference CI executes its tutorials the same way,
SURVEY §4.5)."""

import numpy as np


def test_dibr_train_main_converges():
    from examples.dibr_train import main
    losses, chamfer = main(steps=30, res=64, num_views=2, lr=1e-2)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7
    assert np.isfinite(chamfer)


def test_nglod_train_main_converges():
    from examples.nglod_train import main
    losses, depth = main(level=4, steps=40, render_res=16)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5
    depth = np.asarray(depth)
    assert depth.shape == (16, 16)
    # misses are +inf; the sphere must produce finite hits at center
    assert np.isfinite(depth[8, 8]) and depth[8, 8] > 0
    assert np.isfinite(depth).any() and not np.isfinite(depth).all()
