"""Keypoint/pixel co-transformation invariants.

Mirrors reference tests/test_transforms.py: a single bright pixel and a
keypoint at the same location must stay aligned through rescale, crop,
pad, and rotation.
"""

import numpy as np
import PIL.Image
import pytest

from openpifpaf_tpu import transforms


def apply_transform(im_np, anns, transform=None):
    im = PIL.Image.fromarray(im_np)

    transform_list = [transforms.NormalizeAnnotations()]
    if transform is not None:
        transform_list.append(transform)

    im_transformed, anns_transformed, meta = transforms.Compose(
        transform_list)(im, anns, None)
    im_transformed_np = np.asarray(im_transformed)

    return im_transformed_np, anns_transformed, meta


def single_pixel_transform(x, y, transform, image_wh=(13, 11)):
    im = np.zeros((image_wh[1], image_wh[0], 3), dtype=np.uint8)
    im[y, x, :] = 255

    anns = [{
        'keypoints': [(x, y, 2.0)],
        'bbox': [0.0, 0.0, image_wh[0], image_wh[1]],
    }]

    im_transformed, anns_transformed, _ = apply_transform(im, anns, transform)

    image_yx = np.unravel_index(
        np.argmax(im_transformed[:, :, 0]),
        shape=im_transformed[:, :, 0].shape,
    )

    return (
        [image_yx[1], image_yx[0]],
        np.asarray(anns_transformed[0]['keypoints'][0][:2]).tolist(),
    )


def test_rescale_absolute(x=5, y=5):
    image_xy, keypoint_xy = single_pixel_transform(
        x, y, transforms.RescaleAbsolute(7), image_wh=(11, 11))
    assert image_xy == keypoint_xy


def test_crop(x=4, y=6):
    image_xy, keypoint_xy = single_pixel_transform(
        x, y, transforms.Crop(7), (9, 11))
    assert image_xy == keypoint_xy


def test_pad(x=4, y=6):
    image_xy, keypoint_xy = single_pixel_transform(
        x, y, transforms.CenterPad(17))
    assert image_xy == keypoint_xy


@pytest.mark.parametrize('x', range(10))
def test_rotateby90(x, y=6):
    transform = transforms.Compose([
        transforms.SquarePad(),
        transforms.RotateBy90(),
    ])
    image_xy, keypoint_xy = single_pixel_transform(x, y, transform)
    assert image_xy == pytest.approx(keypoint_xy)


def test_rescale_symmetric():
    """Upscaled single central pixel must stay symmetric
    (reference tests/test_input_processing.py)."""
    np_image = np.zeros((5, 5, 3), dtype=np.uint8)
    np_image[2, 2] = 255

    image = PIL.Image.fromarray(np_image)
    rescaled, _, _ = transforms.RescaleAbsolute(10)(image, [], {
        'offset': np.array([0.0, 0.0]),
        'scale': np.array([1.0, 1.0]),
        'rotation': {'angle': 0.0, 'width': None, 'height': None},
        'valid_area': np.array([0.0, 0.0, 4.0, 4.0]),
    })
    np_result = np.asarray(rescaled)[:, :, 0]
    assert np.all(np_result[:5] == np_result[:4:-1])  # symmetric rows
    assert np.all(np_result[:, :5] == np_result[:, :4:-1])  # symmetric cols


def test_sample_pairing():
    """Pair-level SamplePairing blends with the previous sample and
    concatenates annotations (reference transforms/pair/sample_pairing.py)."""
    from openpifpaf_tpu.transforms.pair import SamplePairing

    t = SamplePairing()
    im_a = PIL.Image.fromarray(
        np.full((8, 8, 3), 200, dtype=np.uint8))
    im_b = PIL.Image.fromarray(
        np.full((8, 8, 3), 100, dtype=np.uint8))
    anns_a = [[{'keypoints': [1]}]]
    anns_b = [[{'keypoints': [2]}]]

    images1, all_anns1, _ = t([im_a], anns_a, [{}])
    assert np.asarray(images1[0])[0, 0, 0] == 200  # first call: no blend
    assert len(all_anns1[0]) == 1

    images2, all_anns2, _ = t([im_b], anns_b, [{}])
    assert np.asarray(images2[0])[0, 0, 0] == 150  # 50/50 blend
    assert len(all_anns2[0]) == 2  # current + previous annotations
