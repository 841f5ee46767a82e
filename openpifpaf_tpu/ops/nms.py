"""Keypoint NMS over decoded poses with an occupancy grid.

Reference: ``csrc/src/nms_keypoints.cpp:17-69`` + ``occupancy.cpp:13-43``.
Annotations are processed in descending score order; joints that land on an
occupied cell are suppressed (v *= 1e-5), surviving joints mark a square
window (side 2*sigma at reduction 2, min scale 4). Then joints below the
keypoint threshold are zeroed and annotations below the instance threshold
are dropped.

Here the sequential annotation loop becomes a per-field pairwise relation:
joint k of pose j is suppressed iff an *accepted* (unsuppressed) joint k of
an earlier-ordered pose i covers j's query cell with its occupancy window.
The greedy scan only ever point-queries the grid, so its result is the
closure of that relation, computed by fixpoint iteration (the same
argument as :func:`openpifpaf_tpu.ops.seeds.seed_nms`) — a few rounds over
a (n_kp, K, K) bool tensor instead of K sequential grid updates.
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
    poses = jnp.asarray(poses)
    k, n_kp, _ = poses.shape
    hs, ws = hr_shape
    gh = int(hs / occupancy_reduction) + 1
    gw = int(ws / occupancy_reduction) + 1
    min_scale_reduced = occupancy_min_scale / occupancy_reduction

    pre_scores = pose_score_uniform(poses)
    sort_order = jnp.argsort(-pre_scores)
    sorted_poses = poses[sort_order]

    v = sorted_poses[:, :, 0]                                   # (K, n_kp)
    x = sorted_poses[:, :, 1] / occupancy_reduction
    y = sorted_poses[:, :, 2] / occupancy_reduction
    sigma = jnp.maximum(min_scale_reduced,
                        sorted_poses[:, :, 3] / occupancy_reduction)

    # query cell of each joint, and the window an accepted joint marks
    # ([x - sigma, x + sigma) like Occupancy::set, clamped to the grid)
    xi = jnp.clip(x.astype(jnp.int32), 0, gw - 1).astype(jnp.float32)
    yi = jnp.clip(y.astype(jnp.int32), 0, gh - 1).astype(jnp.float32)
    minx = jnp.clip(jnp.floor(x - sigma), 0, gw - 1)
    maxx = jnp.clip(jnp.floor(x + sigma), minx + 1, gw)
    miny = jnp.clip(jnp.floor(y - sigma), 0, gh - 1)
    maxy = jnp.clip(jnp.floor(y + sigma), miny + 1, gh)

    active = v > 0.0
    # covers[f, i, j]: would accepted joint f of (sorted) pose i suppress
    # joint f of the later pose j? Joints of one pose live in distinct
    # fields, so strict pose order i < j is exactly the scan order.
    order_ij = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]  # (K, K)
    covers = (active.T[:, :, None]
              & (xi.T[:, None, :] >= minx.T[:, :, None])
              & (xi.T[:, None, :] < maxx.T[:, :, None])
              & (yi.T[:, None, :] >= miny.T[:, :, None])
              & (yi.T[:, None, :] < maxy.T[:, :, None])
              & order_ij[None, :, :])                           # (n_kp, K, K)

    def body(state):
        accept, _ = state
        new = active.T & ~jnp.any(accept[:, :, None] & covers, axis=1)
        return new, jnp.any(new != accept)

    accepted, _ = jax.lax.while_loop(
        lambda st: st[1], body, (active.T, jnp.array(True)))    # (n_kp, K)

    v_new = jnp.where(active & ~accepted.T, v * suppression, v)
    out_sorted = sorted_poses.at[:, :, 0].set(v_new)

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
