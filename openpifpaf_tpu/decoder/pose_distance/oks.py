"""OKS track-to-pose distance (reference ``decoder/pose_distance/oks.py``)."""

import numpy as np


class Oks:
    inflate = 1.0

    def __init__(self, *, track_frames=None):
        if track_frames is None:
            track_frames = [-1]
        assert all(t < 0 for t in track_frames)
        self.track_frames = track_frames
        self.valid_keypoints = None
        self.sigmas = None

    def __call__(self, frame_number, pose, track, track_is_good):
        return min(
            self.distance(frame_number, pose, track, track_is_good, tf)
            for tf in self.track_frames
        )

    @staticmethod
    def scale(pose):
        pose = pose[pose[:, 2] > 0.0]
        area = ((pose[:, 0].max() - pose[:, 0].min())
                * (pose[:, 1].max() - pose[:, 1].min()))
        return np.sqrt(area)

    def distance(self, frame_number, pose, track, track_is_good,
                 track_frame=-1):
        last_track_frame = track.frame_pose[-1][0]
        skipped_frames = frame_number - last_track_frame - 1
        if skipped_frames > 12:
            return 1000.0

        track_frame += skipped_frames
        if track_frame > -1:
            return 1000.0
        if len(track.frame_pose) < -track_frame:
            return 1000.0

        pose1 = pose.data[self.valid_keypoints]
        pose2 = track.frame_pose[track_frame][1].data[self.valid_keypoints]
        visible = np.logical_and(pose1[:, 2] > 0.0, pose2[:, 2] > 0.0)
        if not np.any(visible):
            return 1000.0
        scale = 0.5 * (self.scale(pose1) + self.scale(pose2))
        scale = max(1.0, scale)

        d = np.linalg.norm(pose2[:, :2] - pose1[:, :2], axis=1)
        k = 2.0 * self.sigmas[self.valid_keypoints] * self.inflate
        g = np.exp(-0.5 * d ** 2 / (scale ** 2 * k ** 2))
        oks = np.mean(g[visible])
        return 110.0 * (1.0 - oks)
