"""Event/flow visualization renders (reference event_utils.py:306-448)."""

import numpy as np

from rpeflow_tpu.utils.visualization import (
    events_to_color_image,
    events_to_grey_image,
    event_voxel_to_image,
    flow_to_image,
    write_event_voxel_preview,
    write_events_color,
    write_events_grey,
    write_events_voxel_preview,
)


def _events():
    # x, y, t, p — two positive events, one negative
    return np.array([
        [1, 2, 0.0, 1],
        [3, 0, 0.5, 1],
        [0, 1, 1.0, -1],
        [5, 3, 1.0, 1],   # sets the 6x4 extent
    ], np.float32)


def test_events_to_color_image():
    img = events_to_color_image(_events(), background="black")
    assert img.shape == (4, 6, 3) and img.dtype == np.uint8
    assert tuple(img[2, 1]) == (0, 0, 255)    # positive -> blue
    assert tuple(img[1, 0]) == (255, 0, 0)    # negative -> red
    assert tuple(img[0, 0]) == (0, 0, 0)      # background
    white = events_to_color_image(_events(), background="white")
    assert tuple(white[0, 0]) == (255, 255, 255)


def test_events_to_grey_image():
    img = events_to_grey_image(_events())
    assert img.shape == (4, 6) and img.dtype == np.uint8
    # active pixels saturate under the reference's x1e4 display scaling
    assert img[2, 1] == 255
    # reference quirk reproduced: out-of-range events (here x == width-1)
    # are masked to coordinate (0, 0) and counted there
    assert img[0, 0] == 255
    assert img[3, 3] == 0  # untouched pixel


def test_writers_roundtrip(tmp_path):
    ev = _events()
    vox = np.abs(np.random.RandomState(0).randn(8, 10, 4)).astype(np.float32)
    for name, fn, args in [
        ("color.png", write_events_color, (ev,)),
        ("grey.png", write_events_grey, (ev,)),
        ("vox.png", write_event_voxel_preview, (vox,)),
        ("evox.png", write_events_voxel_preview, (ev,)),
    ]:
        path = tmp_path / name
        fn(str(path), *args)
        assert path.is_file() and path.stat().st_size > 0


def test_write_events_color_center_crop(tmp_path):
    path = tmp_path / "crop.png"
    write_events_color(str(path), _events(), center_crop=(2, 2))
    import imageio.v2 as imageio

    assert imageio.imread(str(path)).shape[:2] == (2, 2)


def test_flow_to_image_shape():
    flow = np.random.RandomState(0).randn(6, 8, 2).astype(np.float32)
    img = flow_to_image(flow)
    assert img.shape == (6, 8, 3) and img.dtype == np.uint8
