"""ODS / VR180 / equirectangular rendering (gc_render.py:481-599 parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_tpu.splat.scene import GaussianScene
from gaussctrl_tpu.cameras.stereo import render_ods, render_pano, render_vr180


def _blob_scene(positions, colors):
    n = len(positions)
    return GaussianScene(
        means=jnp.asarray(positions, jnp.float32),
        scales=jnp.log(jnp.full((n, 3), 0.06)),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        opacities=jnp.full((n, 1), 8.0),
        features_dc=jnp.asarray(colors, jnp.float32),
        features_rest=jnp.zeros((n, 15, 3)),
    )


IDENTITY = np.array([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]])
# dc coefficient 2.0 -> color ~ 2*0.2821+0.5 > 1 (clipped to 1)
RED = [[2.0, -1.0, -1.0]]


@pytest.mark.slow
def test_mono_pano_places_azimuth_correctly():
    """A blob at world +x (azimuth +90 deg) must land at 3/4 panorama width;
    a blob straight ahead (-z) at the center column."""
    scene = _blob_scene([[2.0, 0.0, 0.0], [0.0, 0.0, -2.0]],
                        [[2.0, -1.0, -1.0], [-1.0, 2.0, -1.0]])
    W, H = 128, 64
    pano = render_pano(scene, IDENTITY, W, H, (0.0, 0.0, 0.0), strips=16)
    assert pano.shape == (H, W, 3)
    mid = H // 2
    red_col = int(np.argmax(pano[mid, :, 0]))
    green_col = int(np.argmax(pano[mid, :, 1]))
    assert abs(red_col - int(0.75 * W)) <= 2, red_col
    assert abs(green_col - W // 2) <= 2, green_col


@pytest.mark.slow
def test_ods_parallax_shifts_eyes_apart():
    """A near object must appear at different azimuths in the two ODS eyes
    (opposite shifts), a far object at nearly the same azimuth."""
    near = _blob_scene([[0.0, 0.0, -0.45]], RED)
    W, H = 256, 128
    frame = render_ods(near, IDENTITY, W, H, (0, 0, 0), ipd=0.12, strips=16)
    assert frame.shape == (H, W, 3)
    top, bottom = frame[: H // 2], frame[H // 2:]
    row = H // 4
    l_col = int(np.argmax(top[row, :, 0]))
    r_col = int(np.argmax(bottom[row, :, 0]))
    # left eye sits left of the view axis -> object appears right of center
    assert l_col > W // 2 + 1, l_col
    assert r_col < W // 2 - 1, r_col

    far = _blob_scene([[0.0, 0.0, -30.0]], RED)
    frame = render_ods(far, IDENTITY, W, H, ipd=0.12, background=(0, 0, 0),
                       strips=16)
    l_col = int(np.argmax(frame[row, :, 0]))
    r_col = int(np.argmax(frame[H // 2 + row, :, 0]))
    assert abs(l_col - r_col) <= 1, (l_col, r_col)


@pytest.mark.slow
def test_vr180_layout_and_field():
    """VR180 = left|right 180-degree halves; a forward blob shows up at the
    center of each half."""
    scene = _blob_scene([[0.0, 0.0, -2.0]], RED)
    W, H = 128, 64
    frame = render_vr180(scene, IDENTITY, W, H, (0, 0, 0), strips=8)
    assert frame.shape == (H, W, 3)
    mid = H // 2
    left, right = frame[:, : W // 2], frame[:, W // 2:]
    assert abs(int(np.argmax(left[mid, :, 0])) - W // 4) <= 2
    assert abs(int(np.argmax(right[mid, :, 0])) - W // 4) <= 2
    # something behind the camera must NOT appear in a 180-degree field
    behind = _blob_scene([[0.0, 0.0, 2.0]], RED)
    frame = render_vr180(behind, IDENTITY, W, H, (0, 0, 0), strips=8)
    assert frame.max() < 0.05


@pytest.mark.slow
def test_pano_pitch_above_camera_lands_in_top_half():
    """An above-camera blob must land in the TOP half of the panorama (the
    y-down view convention flips the sign of the pitch term in the
    equirect resample — a regression here vertically mirrors all panos)."""
    scene = _blob_scene([[0.0, 1.5, -2.0]], RED)   # up and ahead
    W, H = 128, 64
    pano = render_pano(scene, IDENTITY, W, H, (0.0, 0.0, 0.0), strips=16)
    ys, xs = np.nonzero(pano[..., 0] > 0.3)
    assert ys.size > 0
    assert ys.mean() < H / 2 - 2, ys.mean()
