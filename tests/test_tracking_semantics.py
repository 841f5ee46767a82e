"""Behavioral pins for the tracking glue.

Covers TrackAnnotation scoring, TrackBase goodness/viability rules,
the pose-distance functions, and PoseSimilarity's Hungarian id
assignment across frames with gaps and newcomers (reference semantics:
``decoder/track_annotation.py``, ``decoder/track_base.py``,
``decoder/pose_distance/*.py``, ``decoder/pose_similarity.py:20-141``).
The expected numbers were captured from the implementation verified
against the reference and must stay stable across rewrites.
"""

import numpy as np
import pytest

from openpifpaf_tpu.annotation import Annotation
from openpifpaf_tpu.decoder import pose_distance
from openpifpaf_tpu.decoder.pose_similarity import PoseSimilarity
from openpifpaf_tpu.decoder.track_annotation import TrackAnnotation
from openpifpaf_tpu.plugins.coco import constants


def make_pose(cx, cy, spread=20.0, v=0.8, seed=0):
    rng = np.random.RandomState(seed)
    ann = Annotation(constants.COCO_KEYPOINTS,
                     constants.COCO_PERSON_SKELETON)
    data = np.zeros((17, 3), dtype=np.float32)
    data[:, 0] = cx + rng.uniform(-spread, spread, 17)
    data[:, 1] = cy + rng.uniform(-spread * 1.5, spread * 1.5, 17)
    data[:, 2] = v
    ann.data = data
    ann.joint_scales = np.full(17, 4.0, dtype=np.float32)
    return ann


def make_track(poses_by_frame):
    track = TrackAnnotation()
    for frame_i, pose in poses_by_frame:
        track.add(frame_i, pose)
    return track


class StubGenerator:
    def __init__(self):
        self.next_poses = []

    def __call__(self, fields, initial_annotations=None):
        return self.next_poses


def make_similarity(distance):
    import openpifpaf_tpu
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas[:2]
    stub = StubGenerator()
    tracker = PoseSimilarity(cif_meta, caf_meta, pose_generator=stub)
    tracker.distance_function = distance()
    tracker.distance_function.valid_keypoints = list(range(17))
    tracker.distance_function.sigmas = np.asarray(cif_meta.sigmas)
    return tracker, stub


def test_track_annotation_pose_lookup():
    p1, p2 = make_pose(100, 100), make_pose(110, 100)
    track = make_track([(1, p1), (3, p2)])
    assert track.pose(1) is p1
    assert track.pose(2) is None
    assert track.pose(3) is p2
    assert track.pose(4) is None
    assert len(track) == 2


def test_track_annotation_scores():
    track = make_track([(i, make_pose(100 + 5 * i, 100, seed=i))
                        for i in range(1, 6)])
    assert track.pose_score(5) == pytest.approx(0.8, abs=1e-6)
    assert track.pose_score(6) == 0.0
    # 5 scored frames out of the 12-frame window
    assert track.score(5) == pytest.approx(0.8 * 5 / 12, abs=1e-6)
    assert track.score(5, current_importance=5.0) == pytest.approx(
        (0.8 * 5 + 4 * 0.8) / 16.0, abs=1e-6)

    # a pose with fewer than 2 confident keypoints scores zero
    weak = make_pose(50, 50, v=0.0)
    weak.data[0, 2] = 0.9
    weak_track = make_track([(1, weak)])
    assert weak_track.pose_score(1) == 0.0


def test_track_ids_increment():
    a, b = TrackAnnotation(), TrackAnnotation()
    assert b.id_ == a.id_ + 1


@pytest.mark.parametrize('distance_cls,expected', [
    (pose_distance.Euclidean, 14.142136),
    (pose_distance.Oks, 97.642353),
    # center shift 14.14/10 plus the short-track penalty of 40
    (pose_distance.Crafted, 41.414215),
])
def test_distance_same_pose_translated(distance_cls, expected):
    """A pure translation by (10, 10): euclidean sees ~14.14px mean,
    crafted sees only the center shift/10 (+ short-track penalty),
    oks decays with sigma."""
    base = make_pose(100, 100, v=0.9)
    moved = make_pose(110, 110, v=0.9)
    moved.data[:, :2] = base.data[:, :2] + 10.0

    dist = distance_cls()
    dist.valid_keypoints = list(range(17))
    dist.sigmas = np.asarray(constants.COCO_PERSON_SIGMAS)
    track = make_track([(1, base)])
    value = dist(2, moved, track, True)
    assert value == pytest.approx(expected, rel=1e-5)


def test_distance_gates():
    base = make_pose(100, 100, v=0.9)
    pose = make_pose(100, 100, v=0.9)
    dist = pose_distance.Euclidean()
    dist.valid_keypoints = list(range(17))

    # stale track: more than 12 skipped frames
    track = make_track([(1, base)])
    assert dist(15, pose, track, True) == 1000.0
    # not enough history for a deep track_frame
    deep = pose_distance.Euclidean(track_frames=[-3])
    deep.valid_keypoints = list(range(17))
    assert deep(2, pose, track, True) == 1000.0
    # hidden keypoints pay the invisible penalty
    hidden = make_pose(100, 100, v=0.01)
    assert dist(2, hidden, track, True) == pytest.approx(110.0)


def test_pose_similarity_id_assignment():
    tracker, stub = make_similarity(pose_distance.Euclidean)

    walker = [make_pose(100 + 8 * i, 100, v=0.8, seed=1) for i in range(5)]
    stander = [make_pose(300, 200, v=0.8, seed=2) for _ in range(5)]
    newcomer = make_pose(500, 300, v=0.8, seed=3)

    # frame 1: two people
    stub.next_poses = [walker[0], stander[0]]
    out1 = tracker(None)
    ids1 = {id(a): a.id_ for a in out1}
    assert len(out1) == 2

    # frames 2-4: both move; newcomer appears in frame 3
    stub.next_poses = [walker[1], stander[1]]
    out2 = tracker(None)
    stub.next_poses = [walker[2], stander[2], newcomer]
    out3 = tracker(None)
    assert len(out3) == 3

    # identity is stable: the walker keeps its id across frames
    walker_id2 = next(a.id_ for a in out2 if a is walker[1])
    walker_id3 = next(a.id_ for a in out3 if a is walker[2])
    assert walker_id2 == walker_id3
    stander_id2 = next(a.id_ for a in out2 if a is stander[1])
    stander_id3 = next(a.id_ for a in out3 if a is stander[2])
    assert stander_id2 == stander_id3
    newcomer_id = next(a.id_ for a in out3 if a is newcomer)
    assert newcomer_id not in (walker_id3, stander_id3)


def test_pose_similarity_reacquires_after_gap():
    tracker, stub = make_similarity(
        lambda: pose_distance.Euclidean(track_frames=[-1, -4]))
    tracker.distance_function.valid_keypoints = list(range(17))

    poses = [make_pose(100 + 5 * i, 100, v=0.8, seed=4) for i in range(8)]
    # three tracked frames: tracks of length <= 2 don't survive a gap
    # (prune_active drops them)
    for i in range(3):
        stub.next_poses = [poses[i]]
        out = tracker(None)
    person_id = out[0].id_

    # two empty frames (occlusion)
    for _ in range(2):
        stub.next_poses = []
        tracker(None)

    stub.next_poses = [poses[5]]
    out6 = tracker(None)
    assert [a.id_ for a in out6] == [person_id]


def test_track_base_goodness_rules():
    from openpifpaf_tpu.decoder.track_base import TrackBase

    tb = TrackBase.__new__(TrackBase)  # no Signal subscription
    tb.active = []
    tb.frame_number = 0
    tb.simplified_track_id_map = {}
    tb.simplified_last_track_id = 0

    strong = make_track([(i, make_pose(100, 100, v=0.8, seed=i))
                         for i in range(1, 5)])
    assert tb.track_is_viable(strong, 4)
    assert tb.track_is_good(strong, 4)
    # stale: last update 40 frames ago
    assert not tb.track_is_viable(strong, 44)

    weak = make_track([(1, make_pose(100, 100, v=0.05, seed=1))])
    assert not tb.track_is_good(weak, 1)

    ids = tb.simplify_ids([104, 99, 104, 7])
    assert ids == [1, 2, 1, 3]
