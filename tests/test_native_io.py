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


@requires_native
@requires_fixture
def test_predictor_native_path_meta_parity():
    """Predictor.images via the native loader produces the same inverse-
    transform meta as the PIL preprocessing pipeline."""
    from openpifpaf_tpu.predictor import Predictor

    p_native = Predictor()
    p_native.long_edge = 161
    p_native.preprocess = p_native._build_preprocess()
    assert p_native._native_loader([TEST_IMAGE]) is not None
    _, _, meta_native = next(iter(p_native.images([TEST_IMAGE])))

    p_pil = Predictor()
    p_pil.long_edge = 161
    p_pil.native_io = False
    p_pil.preprocess = p_pil._build_preprocess()
    _, _, meta_pil = next(iter(p_pil.images([TEST_IMAGE])))

    np.testing.assert_allclose(meta_native['scale'], meta_pil['scale'],
                               rtol=1e-6)
    # the two pipelines pad differently (top-left vs centered), so offsets
    # differ; what must agree is the inverse mapping: a network-coordinate
    # point forward-mapped from the same original pixel must invert back.
    from openpifpaf_tpu.annotation import Annotation

    orig = np.array((160.0, 90.0))  # image center of the 320x180 fixture
    for meta in (meta_native, meta_pil):
        net = orig * meta['scale'] - meta['offset']
        ann = Annotation([f'kp{i}' for i in range(17)], [(1, 2)])
        ann.add(0, (net[0], net[1], 1.0))
        back = ann.inverse_transform(meta)
        np.testing.assert_allclose(back.data[0, :2], orig, atol=1e-3)


@requires_native
@requires_fixture
def test_resize_within_half_lsb_of_float_bilinear():
    """The separable fixed-point resize must stay within 0.5 LSB of exact
    float bilinear (keypoint-aligned mapping) on the decoded pixels."""
    import ctypes

    lib = native._load_library()
    lib.pifpaf_decode_jpeg.restype = ctypes.c_int
    lib.pifpaf_decode_jpeg.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]

    with open(TEST_IMAGE, 'rb') as f:
        data = np.frombuffer(f.read(), np.uint8)
    buf = np.empty(4096 * 4096 * 3, np.uint8)
    size = (ctypes.c_int * 2)()
    rc = lib.pifpaf_decode_jpeg(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(data),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), 4096, 4096, size)
    assert rc == 0
    src_h, src_w = size[0], size[1]
    src = buf[:src_h * src_w * 3].reshape(src_h, src_w, 3).astype(np.float64)

    loader = native.NativeImageLoader(long_edge=161)
    images, metas = loader.load_batch_uint8([TEST_IMAGE])
    scaled_w, scaled_h = metas[0]['scaled_wh']

    def taps(n_dst, n_src):
        f = np.arange(n_dst) * ((n_src - 1) / (n_dst - 1) if n_dst > 1
                                else 0.0)
        i0 = f.astype(int)
        i1 = np.minimum(i0 + 1, n_src - 1)
        return i0, i1, f - i0

    y0, y1, wy = taps(scaled_h, src_h)
    x0, x1, wx = taps(scaled_w, src_w)
    wy = wy[:, None, None]
    wx = wx[None, :, None]
    ref = ((1 - wy) * ((1 - wx) * src[y0][:, x0] + wx * src[y0][:, x1])
           + wy * ((1 - wx) * src[y1][:, x0] + wx * src[y1][:, x1]))
    got = images[0, :scaled_h, :scaled_w].astype(np.float64)
    assert float(np.abs(got - ref).max()) <= 0.76  # 0.25 weight-quantization + 0.5 final rounding + eps
