"""Greedy pose growth, reformulated for TPU.

Reference: ``csrc/src/cifcaf.cpp:265-411``. The C++ decoder grows one pose at
a time with a priority-queue frontier: it lazily evaluates connection values
for frontier edges and always commits the highest-valued one. Because a
connection value depends only on its (already committed, hence fixed) source
joint, that lazy best-first loop is equivalent to:

    repeat: evaluate all frontier edges, commit the global argmax.

That fixpoint formulation is what we implement — a bounded ``while_loop``
(each iteration commits exactly one joint, so <= n_keypoints iterations)
with the per-edge blend (``grow_connection_blend``, ``cifcaf.cpp:32-103``)
vectorized over the dense candidate planes from :mod:`caf_scored`. Poses for
*all* seeds grow in parallel (vmap); the reference's sequential
occupancy-gated seed skipping is replaced by seed NMS before growth and
keypoint NMS after (see :mod:`seeds` and :mod:`nms`).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SkeletonGraph(NamedTuple):
    """Static directed-edge structure derived from a skeleton.

    Directed edge d in [0, E): forward on edge d; d in [E, 2E): backward.
    ``adjacency`` is (n_keypoints, max_degree) of directed-edge indices
    starting at each joint, padded with 2E (a dummy slot).
    """
    n_keypoints: int
    n_edges: int
    dir_start: np.ndarray   # (2E,) int32
    dir_end: np.ndarray     # (2E,) int32
    dir_reverse: np.ndarray  # (2E,) int32
    adjacency: np.ndarray   # (n_keypoints, max_degree) int32
    adjacency_valid: np.ndarray  # (n_keypoints, max_degree) bool


def make_skeleton_graph(n_keypoints, skeleton) -> SkeletonGraph:
    skeleton = np.asarray(skeleton, dtype=np.int32)
    n_edges = len(skeleton)
    j1 = skeleton[:, 0] - 1
    j2 = skeleton[:, 1] - 1
    dir_start = np.concatenate([j1, j2]).astype(np.int32)
    dir_end = np.concatenate([j2, j1]).astype(np.int32)
    dir_reverse = np.concatenate([
        np.arange(n_edges) + n_edges, np.arange(n_edges)]).astype(np.int32)

    degree = np.bincount(dir_start, minlength=n_keypoints)
    max_degree = int(degree.max()) if len(degree) else 1
    adjacency = np.full((n_keypoints, max_degree), 2 * n_edges, dtype=np.int32)
    adjacency_valid = np.zeros((n_keypoints, max_degree), dtype=bool)
    fill = np.zeros(n_keypoints, dtype=np.int32)
    for d, s in enumerate(dir_start):
        adjacency[s, fill[s]] = d
        adjacency_valid[s, fill[s]] = True
        fill[s] += 1
    return SkeletonGraph(n_keypoints, n_edges, dir_start, dir_end,
                         dir_reverse, adjacency, adjacency_valid)


def grow_connection_blend(caf, d, x, y, s, *, filter_sigmas=1.0, only_max=False):
    """Blend of the top-2 candidates of directed edge ``d`` near source (x, y).

    Bit-matches ``cifcaf.cpp:32-103``. Returns (v, tx, ty, ts).
    """
    cc = caf['c'][d]
    sx = caf['sx'][d]
    sy = caf['sy'][d]
    tx = caf['tx'][d]
    ty = caf['ty'][d]
    ts = caf['ts'][d]

    xy_scale = jnp.maximum(s, 0.5)
    sigma_filter = filter_sigmas * xy_scale / 2.0
    sigma2 = 0.25 * xy_scale * xy_scale

    dx = sx - x
    dy = sy - y
    keep = ((cc > 0.0)
            & (jnp.abs(dx) <= sigma_filter)
            & (jnp.abs(dy) <= sigma_filter))
    d2 = dx * dx + dy * dy
    score = jnp.where(keep, jnp.exp(-0.5 * d2 / sigma2) * cc, 0.0)

    i1 = jnp.argmax(score)
    score_1 = score[i1]
    others = jnp.where(jnp.arange(score.shape[0]) == i1, 0.0, score)
    i2 = jnp.argmax(others)
    score_2 = others[i2]

    e1 = jnp.array([tx[i1], ty[i1], jnp.maximum(0.0, ts[i1])])
    e2 = jnp.array([tx[i2], ty[i2], jnp.maximum(0.0, ts[i2])])

    if only_max:
        v = score_1
        out = e1
    else:
        blend_d2 = (e1[0] - e2[0]) ** 2 + (e1[1] - e2[1]) ** 2
        use_single = ((score_2 < 0.01)
                      | (score_2 < 0.5 * score_1)
                      | (blend_d2 > (e1[2] ** 2) / 4.0))
        total = score_1 + score_2
        blended = (score_1 * e1 + score_2 * e2) / jnp.maximum(total, 1e-12)
        v = jnp.where(use_single, 0.5 * score_1, 0.5 * total)
        out = jnp.where(use_single, e1, blended)

    invalid = score_1 == 0.0
    v = jnp.where(invalid, 0.0, v)
    out = jnp.where(invalid, jnp.zeros(3), out)
    return v, out[0], out[1], out[2]


def connection_value(caf, graph_arrays, pose, d, *, keypoint_threshold=0.15,
                     keypoint_threshold_rel=0.5, reverse_match=True,
                     filter_sigmas=1.0, only_max=False):
    """Connection value for directed edge ``d`` given a pose.

    Mirrors ``CifCaf::_connection_value`` (``cifcaf.cpp:349-411``): forward
    blend from the committed source joint, geometric-mean score, absolute and
    relative thresholds, then a reverse-match consistency check.
    Returns (v, x, y, s) of the prospective new joint; v == 0 if rejected.
    """
    dir_start, _, dir_reverse = graph_arrays
    start_i = dir_start[d]
    sv = pose[start_i, 0]
    sx = pose[start_i, 1]
    sy = pose[start_i, 2]
    ss = pose[start_i, 3]

    nv, nx, ny, ns = grow_connection_blend(
        caf, d, sx, sy, ss, filter_sigmas=filter_sigmas, only_max=only_max)

    v = jnp.sqrt(nv * sv)
    ok = (nv > 0.0) & (v >= keypoint_threshold) & (v >= sv * keypoint_threshold_rel)

    if reverse_match:
        rv, rx, ry, _ = grow_connection_blend(
            caf, dir_reverse[d], nx, ny, ns, filter_sigmas=filter_sigmas,
            only_max=only_max)
        rev_ok = (rv > 0.0) & (jnp.abs(sx - rx) + jnp.abs(sy - ry) <= ss)
        ok = ok & rev_ok

    v = jnp.where(ok, v, 0.0)
    return v, nx, ny, ns


def grow_from_pose(caf, graph: SkeletonGraph, pose0, *,
                   keypoint_threshold=0.15, keypoint_threshold_rel=0.5,
                   reverse_match=True, filter_sigmas=1.0, greedy=False,
                   only_max=False, block_joints=False):
    """Grow a (partially filled) pose to completion.

    pose0: (n_keypoints, 4) [v, x, y, s]; joints with v > 0 are fixed and
    form the initial frontier (supports multi-joint initial annotations for
    tracking and force-complete, ``cifcaf.cpp:177-201``).

    block_joints (--cifcaf-block-joints): unreachable frontier targets are
    marked with v=1e-5 at zero coordinates (cifcaf.cpp:291-295; here
    applied at convergence instead of in priority-queue pop order).
    """
    n_kp = graph.n_keypoints
    n_dir = 2 * graph.n_edges

    dir_start = jnp.asarray(graph.dir_start)
    dir_end = jnp.asarray(graph.dir_end)
    dir_reverse = jnp.asarray(graph.dir_reverse)
    adjacency = jnp.asarray(graph.adjacency)
    adjacency_valid = jnp.asarray(graph.adjacency_valid)
    graph_arrays = (dir_start, dir_end, dir_reverse)

    def eval_edges(pose, edges, valid):
        def one(d, is_valid):
            v, x, y, s = connection_value(
                caf, graph_arrays, pose, jnp.minimum(d, n_dir - 1),
                keypoint_threshold=keypoint_threshold,
                keypoint_threshold_rel=keypoint_threshold_rel,
                reverse_match=reverse_match, filter_sigmas=filter_sigmas,
                only_max=only_max)
            v = jnp.where(is_valid, v, 0.0)
            return jnp.stack([v, x, y, s])
        return jax.vmap(one)(edges, valid)

    def eval_one(pose, d):
        v, x, y, s = connection_value(
            caf, graph_arrays, pose, d,
            keypoint_threshold=keypoint_threshold,
            keypoint_threshold_rel=keypoint_threshold_rel,
            reverse_match=reverse_match, filter_sigmas=filter_sigmas,
            only_max=only_max)
        return jnp.stack([v, x, y, s])

    def update_cache(cache, pose, joint):
        edges = adjacency[joint]
        valid = adjacency_valid[joint]
        new_vals = eval_edges(pose, edges, valid)
        safe_edges = jnp.where(valid, edges, n_dir)
        return cache.at[safe_edges].set(
            jnp.where(valid[:, None], new_vals, cache[safe_edges]))

    if greedy:
        # greedy mode (cifcaf.cpp:298-307 with greedy=True): pick the
        # frontier edge with the best source score, evaluate it once and
        # commit immediately; failed edges are excluded from re-selection.
        def body(state):
            pose, failed, step, _ = state
            target_empty = pose[dir_end, 0] == 0.0
            source_filled = pose[dir_start, 0] > 0.0
            active = target_empty & source_filled & ~failed
            priority = jnp.where(active, jnp.sqrt(pose[dir_start, 0]), -1.0)
            best = jnp.argmax(priority)
            any_active = priority[best] > 0.0

            vals = eval_one(pose, best)
            success = any_active & (vals[0] > 0.0)
            pose = jnp.where(success, pose.at[dir_end[best]].set(vals), pose)
            failed = failed.at[best].set(jnp.where(any_active & ~success,
                                                   True, failed[best]))
            return pose, failed, step + 1, any_active

        def cond(state):
            _, _, step, alive = state
            return alive & (step < n_kp + n_dir)

        state0 = (pose0, jnp.zeros((n_dir,), dtype=bool), jnp.int32(0),
                  jnp.array(True))
        pose, _, _, _ = jax.lax.while_loop(cond, body, state0)
        return _apply_block_joints(pose, dir_start, dir_end,
                                   n_kp) if block_joints else pose

    # non-greedy: evaluate-all / commit-global-argmax fixpoint
    cache0 = jnp.zeros((n_dir + 1, 4))

    def init_cache(cache, j):
        filled = pose0[j, 0] > 0.0
        edges = adjacency[j]
        valid = adjacency_valid[j] & filled
        new_vals = eval_edges(pose0, edges, valid)
        safe_edges = jnp.where(valid, edges, n_dir)
        return cache.at[safe_edges].set(
            jnp.where(valid[:, None], new_vals, cache[safe_edges])), None

    cache0, _ = jax.lax.scan(init_cache, cache0, jnp.arange(n_kp))

    def body(state):
        pose, cache, step, _ = state
        target_empty = pose[dir_end, 0] == 0.0
        cand = jnp.where(target_empty, cache[:n_dir, 0], 0.0)
        best = jnp.argmax(cand)
        best_v = cand[best]

        commit = best_v > 0.0
        new_joint = dir_end[best]
        pose = jnp.where(commit, pose.at[new_joint].set(cache[best]), pose)
        cache = jnp.where(commit, update_cache(cache, pose, new_joint), cache)
        return pose, cache, step + 1, commit

    def cond(state):
        _, _, step, alive = state
        return alive & (step < n_kp)

    state0 = (pose0, cache0, jnp.int32(0), jnp.array(True))
    pose, _, _, _ = jax.lax.while_loop(cond, body, state0)
    return _apply_block_joints(pose, dir_start, dir_end,
                               n_kp) if block_joints else pose


def _apply_block_joints(pose, dir_start, dir_end, n_kp):
    marks = jnp.zeros((n_kp,), jnp.int32).at[dir_end].add(
        (pose[dir_start, 0] > 0.0).astype(jnp.int32))
    blocked = (marks > 0) & (pose[:, 0] == 0.0)
    return jnp.where(blocked[:, None],
                     jnp.array([1e-5, 0.0, 0.0, 0.0]), pose)


def grow_pose(caf, graph: SkeletonGraph, seed_f, seed_v, seed_x, seed_y, seed_s,
              **kwargs):
    """Grow one pose from one seed. Returns (n_keypoints, 4) [v, x, y, s]."""
    pose0 = jnp.zeros((graph.n_keypoints, 4))
    pose0 = pose0.at[seed_f].set(jnp.stack([seed_v, seed_x, seed_y, seed_s]))
    return grow_from_pose(caf, graph, pose0, **kwargs)


def grow_poses(caf, graph: SkeletonGraph, seeds, **kwargs):
    """vmap of :func:`grow_pose` over a seed set dict (arrays of equal length).

    Seeds with v == 0 produce all-zero poses.
    """
    def one(f, v, x, y, s):
        pose = grow_pose(caf, graph, f, v, x, y, s, **kwargs)
        return jnp.where(v > 0.0, pose, jnp.zeros_like(pose))
    return jax.vmap(one)(seeds['f'], seeds['v'], seeds['x'], seeds['y'],
                         seeds['s'])


def grow_from_poses(caf, graph: SkeletonGraph, poses, **kwargs):
    """vmap of :func:`grow_from_pose` over (K, n_kp, 4) initial poses."""
    def one(pose0):
        grown = grow_from_pose(caf, graph, pose0, **kwargs)
        any_filled = jnp.any(pose0[:, 0] > 0.0)
        return jnp.where(any_filled, grown, jnp.zeros_like(grown))
    return jax.vmap(one)(poses)


def flood_fill_pose(graph: SkeletonGraph, pose):
    """Copy filled joints into empty neighbors with v = 1e-5
    (``cifcaf.cpp:429-449``), in descending source-score order."""
    n_kp = graph.n_keypoints
    n_dir = 2 * graph.n_edges
    dir_start = jnp.asarray(graph.dir_start)
    dir_end = jnp.asarray(graph.dir_end)

    def body(state):
        pose, step, _ = state
        target_empty = pose[dir_end, 0] == 0.0
        source_filled = pose[dir_start, 0] > 0.0
        active = target_empty & source_filled
        priority = jnp.where(active, jnp.sqrt(pose[dir_start, 0]), -1.0)
        best = jnp.argmax(priority)
        any_active = priority[best] > 0.0

        src = pose[dir_start[best]]
        new_joint = jnp.array([1e-5, src[1], src[2], src[3]])
        pose = jnp.where(any_active,
                         pose.at[dir_end[best]].set(new_joint), pose)
        return pose, step + 1, any_active

    def cond(state):
        _, step, alive = state
        return alive & (step < n_kp)

    pose, _, _ = jax.lax.while_loop(
        cond, body, (pose, jnp.int32(0), jnp.array(True)))
    return pose


def flood_fill_poses(graph: SkeletonGraph, poses):
    return jax.vmap(lambda p: flood_fill_pose(graph, p))(poses)
