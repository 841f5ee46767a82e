"""TrackingPose: video pose tracking decoder
(reference ``decoder/tracking_pose.py:18-296``).

Builds a synthetic two-frame tracking skeleton (single-frame skeleton plus
cross-frame edges kp_i -> kp_i + n_kp) and decodes the combined
[CAF, TCAF] field with the previous frame's poses as initial annotations;
the device decoder grows each track into the current frame.
"""

import argparse
import logging
import time

import numpy as np

from .. import headmeta
from ..annotation import Annotation
from .cifcaf import CifCaf
from .track_annotation import TrackAnnotation
from .track_base import TrackBase

LOG = logging.getLogger(__name__)


class TrackingPose(TrackBase):
    cache_group = [0, -1]
    track_recovery = False
    single_seed = False
    nms_keypoint_threshold = 0.15

    def __init__(self, cif_meta: headmeta.TSingleImageCif,
                 caf_meta: headmeta.TSingleImageCaf,
                 tcaf_meta: headmeta.Tcaf, *, pose_generator=None):
        super().__init__()
        self.cif_meta = cif_meta
        self.caf_meta = caf_meta
        self.tcaf_meta = tcaf_meta

        self.invalid_keypoints = [
            i for i, kp in enumerate(cif_meta.keypoints)
            if kp in ('left_ear', 'right_ear')
        ] if cif_meta.dataset == 'posetrack2018' else []

        self.n_keypoints = len(cif_meta.keypoints)
        n_frames = len(self.cache_group)
        tracking_keypoints = list(cif_meta.keypoints) * n_frames
        tracking_sigmas = list(cif_meta.sigmas) * n_frames
        tracking_skeleton = (
            list(self.caf_meta.skeleton)
            + [
                (keypoint_i + 1, keypoint_i + 1 + frame_i * self.n_keypoints)
                for frame_i in range(1, n_frames)
                for keypoint_i in range(self.n_keypoints)
            ]
        )

        self.tracking_cif_meta = headmeta.Cif(
            'tracking_cif', cif_meta.dataset,
            keypoints=tracking_keypoints, sigmas=tracking_sigmas, pose=None)
        self.tracking_cif_meta.head_index = 0
        self.tracking_cif_meta.base_stride = cif_meta.base_stride
        self.tracking_cif_meta.upsample_stride = cif_meta.upsample_stride

        self.tracking_caf_meta = headmeta.Caf(
            'tracking_caf', caf_meta.dataset,
            keypoints=tracking_keypoints, sigmas=tracking_sigmas,
            skeleton=tracking_skeleton, pose=None)
        self.tracking_caf_meta.head_index = 1
        self.tracking_caf_meta.base_stride = caf_meta.base_stride
        self.tracking_caf_meta.upsample_stride = caf_meta.upsample_stride

        self.pose_generator = pose_generator or CifCaf(
            self.tracking_cif_meta, self.tracking_caf_meta)

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser):
        group = parser.add_argument_group('trackingpose decoder')
        group.add_argument('--trackingpose-track-recovery', default=False,
                           action='store_true')
        group.add_argument('--trackingpose-single-seed', default=False,
                           action='store_true')

    @classmethod
    def configure(cls, args: argparse.Namespace):
        cls.track_recovery = args.trackingpose_track_recovery
        cls.single_seed = args.trackingpose_single_seed

    @classmethod
    def factory(cls, head_metas):
        if len(head_metas) < 3:
            return []
        return [
            cls(cif_meta, caf_meta, tcaf_meta)
            for cif_meta, caf_meta, tcaf_meta
            in zip(head_metas, head_metas[1:], head_metas[2:])
            if (isinstance(cif_meta, headmeta.TSingleImageCif)
                and isinstance(caf_meta, headmeta.TSingleImageCaf)
                and isinstance(tcaf_meta, headmeta.Tcaf))
        ]

    def soft_nms(self, tracks, frame_number):
        """Occupancy-based cross-track suppression
        (tracking_pose.py:118-162)."""
        if not tracks:
            return

        for t in tracks:
            frame_ann = t.pose(frame_number)
            if frame_ann is None:
                continue
            kps = frame_ann.data
            kps[kps[:, 2] < self.nms_keypoint_threshold] = 0.0
            if self.invalid_keypoints:
                kps[self.invalid_keypoints] = 0.0

        max_x = max(1, max(np.max(t.frame_pose[-1][1].data[:, 0])
                           for t in tracks) + 1)
        max_y = max(1, max(np.max(t.frame_pose[-1][1].data[:, 1])
                           for t in tracks) + 1)
        occupied = _HostOccupancy(self.n_keypoints, int(max_y), int(max_x))

        tracks = sorted(
            tracks, key=lambda tr: -tr.score(frame_number,
                                             current_importance=0.01))
        for track in tracks:
            ann = track.pose(frame_number)
            if ann is None:
                continue
            joint_is = np.flatnonzero(ann.data[:, 2])
            for joint_i in joint_is:
                xyv = ann.data[joint_i]
                if occupied.get(joint_i, xyv[0], xyv[1]):
                    xyv[2] = 0.0
                else:
                    occupied.set(joint_i, xyv[0], xyv[1],
                                 ann.joint_scales[joint_i])

        for t in tracks:
            frame_ann = t.pose(frame_number)
            if frame_ann is None:
                continue
            kps = frame_ann.data
            kps[kps[:, 2] < self.nms_keypoint_threshold] = 0.0

    def __call__(self, fields, *, initial_annotations=None):
        self.frame_number += 1
        start = time.perf_counter()

        # build tracking initial annotations from active tracks
        initial_annotations = []
        for track in self.active:
            tracking_ann = Annotation(
                self.tracking_cif_meta.keypoints,
                self.tracking_caf_meta.skeleton)
            tracking_ann.id_ = track.id_
            for position_i, frame_i in enumerate(self.cache_group[1:], start=1):
                prev_pose = track.pose(self.frame_number + frame_i)
                if prev_pose is not None:
                    sl = slice(self.n_keypoints * position_i,
                               self.n_keypoints * (position_i + 1))
                    tracking_ann.data[sl] = prev_pose.data
                    tracking_ann.joint_scales[sl] = prev_pose.joint_scales

            if self.single_seed:
                inverse_mask = (tracking_ann.data[:, 2]
                                < np.amax(tracking_ann.data[:, 2]))
                tracking_ann.data[inverse_mask] = 0.0
                tracking_ann.joint_scales[inverse_mask] = 0.0
            tracking_ann.data[tracking_ann.data[:, 2] < 0.05] = 0.0
            if not np.any(tracking_ann.data[:, 2] > 0.0):
                continue
            initial_annotations.append(tracking_ann)
        initial_annotations = sorted(
            initial_annotations, key=lambda ann: ann.bbox()[3], reverse=True)

        tracking_fields = [
            fields[self.cif_meta.head_index],
            np.concatenate([
                np.asarray(fields[self.caf_meta.head_index]),
                np.asarray(fields[self.tcaf_meta.head_index]),
            ], axis=0),
        ]
        tracking_annotations = self.pose_generator(
            tracking_fields, initial_annotations=initial_annotations)

        # extract current-frame poses, assign track ids
        active_by_id = {t.id_: t for t in self.active}
        lost_trackids = {t.id_: t.frame_pose[-1][0] for t in self.active
                         if t.frame_pose[-1][0] < self.frame_number - 1}
        for tracking_ann in tracking_annotations:
            single_frame_ann = Annotation(
                self.cif_meta.keypoints, self.caf_meta.skeleton)
            single_frame_ann.data[:] = tracking_ann.data[:self.n_keypoints]
            single_frame_ann.joint_scales = \
                tracking_ann.joint_scales[:self.n_keypoints]

            track_id = getattr(tracking_ann, 'id_', None)
            if track_id is None or track_id not in active_by_id:
                new_track = TrackAnnotation().add(
                    self.frame_number, single_frame_ann)
                self.active.append(new_track)
                tracking_ann.id_ = new_track.id_
                continue
            active_by_id[track_id].add(self.frame_number, single_frame_ann)

        self.soft_nms(self.active, self.frame_number)

        if self.track_recovery:
            removed = set()
            for track in self.active:
                if not lost_trackids:
                    break
                if len(track) > 1:
                    continue
                if track.pose(self.frame_number) is None:
                    continue
                track_id = max(lost_trackids.items(), key=lambda d: d[1])[0]
                del lost_trackids[track_id]
                active_by_id[track_id].add(
                    self.frame_number, track.pose(self.frame_number))
                removed.add(track)
            self.active = [t for t in self.active if t not in removed]

        self.active = [t for t in self.active
                       if self.track_is_viable(t, self.frame_number)]

        LOG.debug('track time: %.3fs', time.perf_counter() - start)
        return self.annotations(self.frame_number)


class _HostOccupancy:
    """Small host-side occupancy grid (Occupancy semantics, reduction 2)."""

    def __init__(self, n_fields, height, width, reduction=2.0, min_scale=4.0):
        self.reduction = reduction
        self.min_scale_reduced = min_scale / reduction
        self.grid = np.zeros((n_fields,
                              int(height / reduction) + 1,
                              int(width / reduction) + 1), dtype=bool)

    def set(self, f, x, y, sigma):
        x /= self.reduction
        y /= self.reduction
        sigma = max(self.min_scale_reduced, sigma / self.reduction)
        gh, gw = self.grid.shape[1:]
        minx = int(np.clip(int(x - sigma), 0, gw - 1))
        miny = int(np.clip(int(y - sigma), 0, gh - 1))
        maxx = int(np.clip(int(x + sigma), minx + 1, gw))
        maxy = int(np.clip(int(y + sigma), miny + 1, gh))
        self.grid[f, miny:maxy, minx:maxx] = True

    def get(self, f, x, y):
        if f >= self.grid.shape[0]:
            return True
        x /= self.reduction
        y /= self.reduction
        gh, gw = self.grid.shape[1:]
        xi = int(np.clip(int(x), 0, gw - 1))
        yi = int(np.clip(int(y), 0, gh - 1))
        return bool(self.grid[f, yi, xi])
