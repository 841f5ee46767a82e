"""Native C++ IO library tests."""

import os

import numpy as np
import pytest

from openpifpaf_tpu.io import native

TEST_IMAGE = '/root/reference/tests/coco/images/puppy_dog.jpg'

requires_native = pytest.mark.skipif(
    not native.native_available(), reason='native io library not built')
requires_fixture = pytest.mark.skipif(
    not os.path.exists(TEST_IMAGE), reason='fixture not available')


@requires_native
@requires_fixture
def test_load_batch():
    loader = native.NativeImageLoader(long_edge=161)
    images, metas = loader.load_batch([TEST_IMAGE, TEST_IMAGE])
    assert images.shape == (2, 161, 161, 3)
    assert images.dtype == np.float32
    # the two slots must be identical
    np.testing.assert_array_equal(images[0], images[1])

    meta = metas[0]
    assert meta['scaled_wh'][0] == 161  # long edge
    assert tuple(meta['width_height']) == (320, 180)

    # normalized pixel stats should look like an image, not zeros
    scaled_w, scaled_h = meta['scaled_wh'][1], meta['scaled_wh'][0]
    content = images[0, :scaled_h, :scaled_w]
    assert float(np.abs(content).mean()) > 0.1


@requires_native
@requires_fixture
def test_close_to_pil():
    import PIL.Image
    from openpifpaf_tpu import transforms

    loader = native.NativeImageLoader(long_edge=161)
    images, metas = loader.load_batch([TEST_IMAGE])

    with open(TEST_IMAGE, 'rb') as f:
        im = PIL.Image.open(f).convert('RGB')
    pre = transforms.Compose([
        transforms.NormalizeAnnotations(),
        transforms.RescaleAbsolute(161),
        transforms.EVAL_TRANSFORM,
    ])
    pim, _, _ = pre(im, [], {})
    sh, sw = pim.shape[:2]
    diff = np.abs(images[0, :sh, :sw] - pim)
    # PIL downsampling is antialiased, the native path is pure bilinear:
    # close but not identical
    assert float(diff.mean()) < 0.5
