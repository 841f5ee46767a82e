"""Painter debug overlays render (reference show/painters.py:19-408).

Each --show-* option must actually draw: the tests count the artists the
overlay adds to the axis, so a silently no-op option fails.
"""

import numpy as np
import pytest

matplotlib = pytest.importorskip('matplotlib')
matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402

from openpifpaf_tpu.annotation import (Annotation, AnnotationDet,  # noqa: E402
                                       AnnotationCrowd)
from openpifpaf_tpu.plugins.coco import constants  # noqa: E402
from openpifpaf_tpu import show  # noqa: E402


def _person_ann():
    rng = np.random.RandomState(0)
    ann = Annotation(constants.COCO_KEYPOINTS, constants.COCO_PERSON_SKELETON)
    data = np.zeros((17, 3), np.float32)
    data[:, 0] = 50 + rng.rand(17) * 60
    data[:, 1] = 40 + rng.rand(17) * 120
    data[:, 2] = 0.2 + 0.8 * rng.rand(17)
    ann.set(data, joint_scales=2.0 + rng.rand(17) * 6)
    ann.decoding_order = [
        (0, 1, tuple(data[0]), tuple(data[1])),
        (1, 3, tuple(data[1]), tuple(data[3])),
    ]
    ann.frontier_order = [(3, 5), (5, 7)]
    return ann


def _artist_count(paint):
    fig, ax = plt.subplots()
    try:
        paint(ax)
        return (len(ax.lines) + len(ax.patches) + len(ax.texts)
                + len(ax.collections))
    finally:
        plt.close(fig)


@pytest.fixture(autouse=True)
def _reset_painter_class_attrs():
    saved = {k: getattr(show.KeypointPainter, k)
             for k in ('show_box', 'show_joint_scales',
                       'show_joint_confidences', 'show_decoding_order',
                       'show_frontier_order',
                       'show_only_decoded_connections')}
    yield
    for k, v in saved.items():
        setattr(show.KeypointPainter, k, v)


def test_keypoint_painter_baseline():
    ann = _person_ann()
    kp = show.KeypointPainter()
    n = _artist_count(lambda ax: kp.annotation(ax, ann))
    assert n >= 2  # skeleton line collection + joints scatter


@pytest.mark.parametrize('option,min_extra', [
    ('show_box', 1),               # rectangle patch (+ score text)
    ('show_joint_scales', 10),     # one square per visible joint
    ('show_joint_confidences', 10),  # one text per visible joint
    ('show_decoding_order', 2),    # a dashed line + step text per entry
    ('show_frontier_order', 1),    # dotted black skeleton overlay
])
def test_keypoint_painter_overlays(option, min_extra):
    ann = _person_ann()
    base = _artist_count(lambda ax: show.KeypointPainter().annotation(ax, ann))
    setattr(show.KeypointPainter, option, True)
    with_overlay = _artist_count(
        lambda ax: show.KeypointPainter().annotation(ax, ann))
    assert with_overlay >= base + min_extra, option


def test_only_decoded_connections_masks_skeleton():
    ann = _person_ann()
    fig, ax = plt.subplots()
    show.KeypointPainter.show_only_decoded_connections = True
    show.KeypointPainter().annotation(ax, ann)
    # decoding_order covers 2 edges -> the line collection has <= 2 lines
    lines = [c for c in ax.collections
             if isinstance(c, matplotlib.collections.LineCollection)]
    assert lines and len(lines[0].get_segments()) <= 2
    plt.close(fig)


def test_keypoints_array_api():
    kp = show.KeypointPainter()
    kps = np.zeros((2, 17, 3), np.float32)
    kps[:, :, 0] = np.linspace(10, 60, 17)
    kps[:, :, 1] = np.linspace(10, 120, 17)
    kps[:, :, 2] = 1.0
    n = _artist_count(lambda ax: kp.keypoints(
        ax, kps, skeleton=constants.COCO_PERSON_SKELETON))
    assert n >= 4


def test_detection_painter_subtext():
    ann = AnnotationDet(['__background__', 'person']).set(
        1, 0.75, np.asarray([10.0, 10.0, 40.0, 80.0]))
    dp = show.DetectionPainter()
    n = _artist_count(lambda ax: dp.annotation(ax, ann))
    assert n >= 3  # box + category text + score subtext


def test_crowd_painter():
    ann = AnnotationCrowd(['__background__', 'person']).set(
        1, np.asarray([5.0, 5.0, 30.0, 30.0]))
    cp = show.CrowdPainter()
    n = _artist_count(lambda ax: cp.annotations(ax, [ann]))
    assert n >= 2  # dotted rectangle + crowd text


def test_crowd_draw_polygon():
    outline = np.asarray([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    n = _artist_count(
        lambda ax: show.CrowdPainter.draw_polygon(ax, [outline]))
    assert n >= 1


def test_annotation_painter_dispatch():
    anns = [_person_ann(),
            AnnotationDet(['__background__', 'person']).set(
                1, 0.5, np.asarray([1.0, 1.0, 5.0, 5.0]))]
    painter = show.AnnotationPainter()
    n = _artist_count(lambda ax: painter.annotations(ax, anns))
    assert n >= 5
