"""Native C++ runtime (PNG decode + prefetching loader) vs reference decoders."""

import numpy as np
import pytest

from linemod_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native library not buildable")


def test_png_decode_matches_cv2(fixture_paths):
    import cv2

    img = native.decode_png(fixture_paths["img0"])
    depth = native.decode_png(fixture_paths["depth0"])
    assert np.array_equal(img[..., ::-1], cv2.imread(fixture_paths["img0"]))
    assert np.array_equal(
        depth, cv2.imread(fixture_paths["depth0"], cv2.IMREAD_ANYDEPTH)
    )
    assert depth.dtype == np.uint16


def test_prefetch_loader_sequence(fixture_paths, tmp_path):
    import cv2
    import shutil

    # build a 3-frame sequence from the fixture
    for i in range(3):
        shutil.copy(fixture_paths["img0"], tmp_path / f"img{i}.png")
        shutil.copy(fixture_paths["depth0"], tmp_path / f"depth{i}.png")
    ld = native.NativeFrameLoader(
        str(tmp_path / "img%d.png"), str(tmp_path / "depth%d.png")
    )
    frames = list(ld)
    assert len(frames) == 3
    ref = cv2.imread(fixture_paths["img0"])
    for color, depth in frames:
        assert np.array_equal(color, ref)
        assert depth.max() == 983


def test_decode_error_on_garbage(tmp_path):
    p = tmp_path / "bad.png"
    p.write_bytes(b"not a png at all")
    with pytest.raises(IOError):
        native.decode_png(str(p))
