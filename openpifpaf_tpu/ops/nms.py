"""Keypoint NMS over decoded poses with an occupancy grid.

Reference: ``csrc/src/nms_keypoints.cpp:17-69`` + ``occupancy.cpp:13-43``.
Annotations are processed in descending score order; joints that land on an
occupied cell are suppressed (v *= 1e-5), surviving joints mark a square
window (side 2*sigma at reduction 2, min scale 4). Then joints below the
keypoint threshold are zeroed and annotations below the instance threshold
are dropped.

Here the annotation loop is a ``lax.scan`` over score-sorted poses with the
occupancy grid as carry; the per-joint window writes are vectorized over all
keypoint fields at once.
"""

import jax
import jax.numpy as jnp


def pose_score_uniform(poses):
    """UniformScore: mean confidence over all joints (nms_keypoints.hpp:25-32)."""
    return jnp.mean(poses[..., 0], axis=-1)


def mark_occupancy(poses, hr_shape, *, occupancy_reduction=2.0,
                   occupancy_min_scale=4.0):
    """Occupancy grid with windows marked for every joint of every pose
    (Occupancy::set semantics). poses: (K, n_kp, 4)."""
    k, n_kp, _ = poses.shape
    hs, ws = hr_shape
    gh = int(hs / occupancy_reduction) + 1
    gw = int(ws / occupancy_reduction) + 1
    min_scale_reduced = occupancy_min_scale / occupancy_reduction

    ys_grid = jnp.arange(gh, dtype=jnp.float32)[None, :, None]
    xs_grid = jnp.arange(gw, dtype=jnp.float32)[None, None, :]

    def body(occ, pose):
        v = pose[:, 0]
        x = pose[:, 1] / occupancy_reduction
        y = pose[:, 2] / occupancy_reduction
        sigma = jnp.maximum(min_scale_reduced,
                            pose[:, 3] / occupancy_reduction)
        minx = jnp.clip(jnp.floor(x - sigma), 0, gw - 1)
        maxx = jnp.clip(jnp.floor(x + sigma), minx + 1, gw)
        miny = jnp.clip(jnp.floor(y - sigma), 0, gh - 1)
        maxy = jnp.clip(jnp.floor(y + sigma), miny + 1, gh)
        window = ((ys_grid >= miny[:, None, None])
                  & (ys_grid < maxy[:, None, None])
                  & (xs_grid >= minx[:, None, None])
                  & (xs_grid < maxx[:, None, None])
                  & (v > 0.0)[:, None, None])
        return occ | window, None

    occ0 = jnp.zeros((n_kp, gh, gw), dtype=bool)
    occ, _ = jax.lax.scan(body, occ0, poses)
    return occ


def nms_keypoints(poses, hr_shape, *, suppression=1e-5,
                  instance_threshold=0.15, keypoint_threshold=0.15,
                  occupancy_reduction=2.0, occupancy_min_scale=4.0):
    """poses: (K, n_kp, 4) [v, x, y, s] in hi-res pixels.

    Returns (poses_out, keep, order):
      poses_out — (K, n_kp, 4) suppressed/zeroed joints, in original order
      keep      — (K,) bool, annotations above the instance threshold
      order     — (K,) indices sorting poses by final score descending
    """
    k, n_kp, _ = poses.shape
    hs, ws = hr_shape
    gh = int(hs / occupancy_reduction) + 1
    gw = int(ws / occupancy_reduction) + 1
    min_scale_reduced = occupancy_min_scale / occupancy_reduction

    pre_scores = pose_score_uniform(poses)
    sort_order = jnp.argsort(-pre_scores)
    sorted_poses = poses[sort_order]

    ys_grid = jnp.arange(gh, dtype=jnp.float32)[None, :, None]
    xs_grid = jnp.arange(gw, dtype=jnp.float32)[None, None, :]

    def body(occ, pose):
        v = pose[:, 0]
        x = pose[:, 1] / occupancy_reduction
        y = pose[:, 2] / occupancy_reduction
        sigma = jnp.maximum(min_scale_reduced, pose[:, 3] / occupancy_reduction)

        xi = jnp.clip(x.astype(jnp.int32), 0, gw - 1)
        yi = jnp.clip(y.astype(jnp.int32), 0, gh - 1)
        f_idx = jnp.arange(n_kp)
        occupied = occ[f_idx, yi, xi]

        active = v > 0.0
        v_new = jnp.where(active & occupied, v * suppression, v)

        # joints that were not suppressed mark their window
        mark = active & ~occupied
        minx = jnp.clip(jnp.floor(x - sigma), 0, gw - 1)
        maxx = jnp.clip(jnp.floor(x + sigma), minx + 1, gw)
        miny = jnp.clip(jnp.floor(y - sigma), 0, gh - 1)
        maxy = jnp.clip(jnp.floor(y + sigma), miny + 1, gh)
        window = ((ys_grid >= miny[:, None, None])
                  & (ys_grid < maxy[:, None, None])
                  & (xs_grid >= minx[:, None, None])
                  & (xs_grid < maxx[:, None, None])
                  & mark[:, None, None])
        occ = occ | window

        pose_out = pose.at[:, 0].set(v_new)
        return occ, pose_out

    occ0 = jnp.zeros((n_kp, gh, gw), dtype=bool)
    _, out_sorted = jax.lax.scan(body, occ0, sorted_poses)

    # zero joints below keypoint threshold
    v = out_sorted[:, :, 0]
    v = jnp.where(v > keypoint_threshold, v, 0.0)
    out_sorted = out_sorted.at[:, :, 0].set(v)

    scores = pose_score_uniform(out_sorted)
    keep_sorted = scores >= instance_threshold

    # return in original order with a final score-descending ordering
    inverse = jnp.argsort(sort_order)
    poses_out = out_sorted[inverse]
    keep = keep_sorted[inverse]
    final_scores = jnp.where(keep, pose_score_uniform(poses_out), -jnp.inf)
    order = jnp.argsort(-final_scores)
    return poses_out, keep, order
