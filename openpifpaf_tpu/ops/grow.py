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
    ``adjacency`` lists the directed edges starting at each joint,
    (n_keypoints, max_degree) padded int32 with ``adjacency_valid`` flags —
    the incremental growth loop re-evaluates exactly these edges when a
    joint commits.
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
    adjacency = np.zeros((n_keypoints, max_degree), dtype=np.int32)
    adjacency_valid = np.zeros((n_keypoints, max_degree), dtype=bool)
    fill = np.zeros(n_keypoints, dtype=np.int32)
    for d, s in enumerate(dir_start):
        adjacency[s, fill[s]] = d
        adjacency_valid[s, fill[s]] = True
        fill[s] += 1
    return SkeletonGraph(n_keypoints, n_edges, dir_start, dir_end,
                         dir_reverse, adjacency, adjacency_valid)


def blend_batch(cc, sx, sy, tx, ty, ts, x, y, s, *,
                filter_sigmas=1.0, only_max=False):
    """Top-2 candidate blend batched over directed edges (cifcaf.cpp:32-103).

    Candidate arrays: (D, C); x, y, s: (..., D) with the leading batch axes
    broadcasting against them. Returns (v, tx, ty, ts), each (..., D).

    TPU formulation: scoring is elementwise over (..., D, C) and fuses into
    the argmax reductions; the winner's values are extracted with one-hot
    masked sums instead of gathers (TPU lowers general gathers to serialized
    scalar loops — one-hot select/reduce stays on the VPU).
    """
    x = jnp.asarray(x)[..., None]
    y = jnp.asarray(y)[..., None]
    s = jnp.asarray(s)[..., None]

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

    n_cand = score.shape[-1]
    iota = jnp.arange(n_cand)
    i1 = jnp.argmax(score, axis=-1)
    oh1 = iota == i1[..., None]
    score_1 = jnp.sum(jnp.where(oh1, score, 0.0), axis=-1)
    others = jnp.where(oh1, 0.0, score)
    i2 = jnp.argmax(others, axis=-1)
    oh2 = iota == i2[..., None]
    score_2 = jnp.sum(jnp.where(oh2, others, 0.0), axis=-1)

    def pick(a, oh):
        return jnp.sum(jnp.where(oh, a, 0.0), axis=-1)

    e1x, e1y = pick(tx, oh1), pick(ty, oh1)
    e1s = jnp.maximum(0.0, pick(ts, oh1))
    e2x, e2y = pick(tx, oh2), pick(ty, oh2)
    e2s = jnp.maximum(0.0, pick(ts, oh2))

    if only_max:
        v = score_1
        ox, oy, os_ = e1x, e1y, e1s
    else:
        blend_d2 = (e1x - e2x) ** 2 + (e1y - e2y) ** 2
        use_single = ((score_2 < 0.01)
                      | (score_2 < 0.5 * score_1)
                      | (blend_d2 > (e1s ** 2) / 4.0))
        total = score_1 + score_2
        denom = jnp.maximum(total, 1e-12)
        bx = (score_1 * e1x + score_2 * e2x) / denom
        by = (score_1 * e1y + score_2 * e2y) / denom
        bs = (score_1 * e1s + score_2 * e2s) / denom
        v = jnp.where(use_single, 0.5 * score_1, 0.5 * total)
        ox = jnp.where(use_single, e1x, bx)
        oy = jnp.where(use_single, e1y, by)
        os_ = jnp.where(use_single, e1s, bs)

    invalid = score_1 == 0.0
    v = jnp.where(invalid, 0.0, v)
    ox = jnp.where(invalid, 0.0, ox)
    oy = jnp.where(invalid, 0.0, oy)
    os_ = jnp.where(invalid, 0.0, os_)
    return v, ox, oy, os_


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
                   only_max=False, block_joints=False, record_order=False):
    """Grow a (partially filled) pose to completion.

    pose0: (n_keypoints, 4) [v, x, y, s]; joints with v > 0 are fixed and
    form the initial frontier (supports multi-joint initial annotations for
    tracking and force-complete, ``cifcaf.cpp:177-201``).

    block_joints (--cifcaf-block-joints): unreachable frontier targets are
    marked with v=1e-5 at zero coordinates (cifcaf.cpp:291-295; here
    applied at convergence instead of in priority-queue pop order).

    record_order: additionally return ``(commit_edge, commit_step)``
    int32 (n_keypoints,) arrays — for each joint, the directed-edge index
    that committed it and at which loop step (-1 for seed joints and
    joints never committed). This is the reference's per-annotation
    ``decoding_order`` (``cifcaf.cpp:309-346`` appends to it on each
    commit), recorded as dense arrays so the jitted graph stays
    static-shape.
    """
    n_kp = graph.n_keypoints
    n_dir = 2 * graph.n_edges

    dir_start = jnp.asarray(graph.dir_start)
    dir_end = jnp.asarray(graph.dir_end)
    dir_reverse = jnp.asarray(graph.dir_reverse)
    graph_arrays = (dir_start, dir_end, dir_reverse)
    # reverse-directed candidate planes: a static half-swap of the
    # concatenated forward/backward layout, gathered once outside the loop
    caf_rev = {k: v[graph.dir_reverse] for k, v in caf.items()}

    def eval_one(pose, d):
        v, x, y, s = connection_value(
            caf, graph_arrays, pose, d,
            keypoint_threshold=keypoint_threshold,
            keypoint_threshold_rel=keypoint_threshold_rel,
            reverse_match=reverse_match, filter_sigmas=filter_sigmas,
            only_max=only_max)
        return jnp.stack([v, x, y, s])

    def _connection_values(rows, rows_rev, sv, sx, sy, ss):
        """Connection values for candidate rows with source (sv, sx, sy,
        ss), shapes broadcasting over the leading edge axis. The single
        scoring path shared by the dense init and the per-commit update —
        the cache's exactness invariant requires them bit-identical."""
        nv, nx, ny, ns = blend_batch(
            rows['c'], rows['sx'], rows['sy'], rows['tx'], rows['ty'],
            rows['ts'], sx, sy, ss,
            filter_sigmas=filter_sigmas, only_max=only_max)

        v = jnp.sqrt(nv * sv)
        ok = ((nv > 0.0) & (v >= keypoint_threshold)
              & (v >= sv * keypoint_threshold_rel))

        if reverse_match:
            rv, rx, ry, _ = blend_batch(
                rows_rev['c'], rows_rev['sx'], rows_rev['sy'],
                rows_rev['tx'], rows_rev['ty'], rows_rev['ts'],
                nx, ny, ns, filter_sigmas=filter_sigmas, only_max=only_max)
            rev_ok = (rv > 0.0) & (jnp.abs(sx - rx) + jnp.abs(sy - ry) <= ss)
            ok = ok & rev_ok

        v = jnp.where(ok & (sv > 0.0), v, 0.0)
        return jnp.stack([v, nx, ny, ns], axis=-1)

    def eval_all_edges(pose):
        """Connection values of ALL directed edges at once: (n_dir, 4).

        Committed joints are immutable, so re-evaluating an edge yields
        exactly the value a lazily-refreshed cache would hold — this dense
        pass replaces the reference's per-edge frontier bookkeeping
        (``cifcaf.cpp:309-346``) with static-shape VPU work (no gathers
        beyond the tiny pose-row lookup).
        """
        return _connection_values(
            caf, caf_rev, pose[dir_start, 0], pose[dir_start, 1],
            pose[dir_start, 2], pose[dir_start, 3])

    # the (commit_edge, commit_step) carries exist ONLY when recording:
    # two extra loop-carried arrays measurably slow the hot grow loop
    # (single-image decode 0.78 -> 1.06 ms when carried unconditionally)
    order0 = (jnp.full((n_kp,), -1, jnp.int32),) * 2 if record_order else ()

    if greedy:
        # greedy mode (cifcaf.cpp:298-307 with greedy=True): pick the
        # frontier edge with the best source score, evaluate it once and
        # commit immediately; failed edges are excluded from re-selection.
        def body(state):
            pose, failed, step, _, *order = state
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
            if record_order:
                ce, cs = order
                order = (
                    ce.at[dir_end[best]].set(
                        jnp.where(success, best, ce[dir_end[best]])),
                    cs.at[dir_end[best]].set(
                        jnp.where(success, step, cs[dir_end[best]])),
                )
            return (pose, failed, step + 1, any_active) + tuple(order)

        def cond(state):
            step, alive = state[2], state[3]
            return alive & (step < n_kp + n_dir)

        state0 = (pose0, jnp.zeros((n_dir,), dtype=bool), jnp.int32(0),
                  jnp.array(True)) + order0
        pose, _, _, _, *order = jax.lax.while_loop(cond, body, state0)
        if block_joints:
            pose = _apply_block_joints(pose, dir_start, dir_end, n_kp)
        return (pose, order[0], order[1]) if record_order else pose

    # non-greedy: evaluate-all / commit-global-argmax fixpoint. A frontier
    # edge's value depends only on its committed (immutable) source joint,
    # so the cached value of every edge stays correct until its source
    # commits — one dense pass initializes the cache, and each committed
    # joint re-evaluates only its <= max_degree outgoing edges (a small
    # static-size row gather + blend), exactly reproducing what the
    # reference's lazily-refreshed priority queue pops.
    adjacency = jnp.asarray(graph.adjacency)
    adjacency_valid = jnp.asarray(graph.adjacency_valid)

    def eval_adjacent(pose, joint):
        """(max_degree, 4) connection values of the edges leaving joint."""
        edges = adjacency[joint]
        valid = adjacency_valid[joint]
        rows = {k: v[edges] for k, v in caf.items()}
        rows_rev = {k: v[edges] for k, v in caf_rev.items()}

        deg = edges.shape[0]
        vals = _connection_values(
            rows, rows_rev, pose[joint, 0],
            jnp.broadcast_to(pose[joint, 1], (deg,)),
            jnp.broadcast_to(pose[joint, 2], (deg,)),
            jnp.broadcast_to(pose[joint, 3], (deg,)))
        vals = vals.at[:, 0].set(jnp.where(valid, vals[:, 0], 0.0))
        return vals, edges, valid

    def body(state):
        pose, cache, step, _, *order = state
        target_empty = pose[dir_end, 0] == 0.0
        cand = jnp.where(target_empty, cache[:n_dir, 0], 0.0)
        best = jnp.argmax(cand)
        best_v = cand[best]

        commit = best_v > 0.0
        new_joint = dir_end[best]
        pose = jnp.where(commit, pose.at[new_joint].set(cache[best]), pose)

        vals, edges, valid = eval_adjacent(pose, new_joint)
        slots = jnp.where(valid & commit, edges, n_dir)
        cache = cache.at[slots].set(
            jnp.where((valid & commit)[:, None], vals, cache[slots]))
        if record_order:
            ce, cs = order
            order = (
                ce.at[new_joint].set(jnp.where(commit, best,
                                               ce[new_joint])),
                cs.at[new_joint].set(jnp.where(commit, step,
                                               cs[new_joint])),
            )
        return (pose, cache, step + 1, commit) + tuple(order)

    def cond(state):
        step, alive = state[2], state[3]
        return alive & (step < n_kp)

    cache0 = jnp.concatenate(
        [eval_all_edges(pose0), jnp.zeros((1, 4))], axis=0)
    state0 = (pose0, cache0, jnp.int32(0), jnp.array(True)) + order0
    pose, _, _, _, *order = jax.lax.while_loop(cond, body, state0)
    if block_joints:
        pose = _apply_block_joints(pose, dir_start, dir_end, n_kp)
    return (pose, order[0], order[1]) if record_order else pose


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


def grow_poses(caf, graph: SkeletonGraph, seeds, *, lane_chunk=32, **kwargs):
    """vmap of :func:`grow_pose` over a seed set dict (arrays of equal length).

    Seeds with v == 0 produce all-zero poses. Seeds arrive score-sorted
    (valid prefix first), so growth runs in chunks of ``lane_chunk`` lanes
    with every chunk beyond the first guarded by a ``lax.cond`` — a scene
    with 6 poses only pays for the first chunk of the static ``n_poses``
    budget. (Under a batch vmap the cond degrades to a select, which
    matches the old always-grow behavior.)
    """
    record = kwargs.get('record_order', False)

    def chunk(sl):
        def one(f, v, x, y, s):
            out = grow_pose(caf, graph, f, v, x, y, s, **kwargs)
            if record:
                pose, ce, cs = out
                empty = jnp.full_like(ce, -1)
                return (jnp.where(v > 0.0, pose, jnp.zeros_like(pose)),
                        jnp.where(v > 0.0, ce, empty),
                        jnp.where(v > 0.0, cs, empty))
            return jnp.where(v > 0.0, out, jnp.zeros_like(out))
        return jax.vmap(one)(sl['f'], sl['v'], sl['x'], sl['y'], sl['s'])

    def empty_chunk(s):
        m = s['v'].shape[0]
        poses = jnp.zeros((m, graph.n_keypoints, 4))
        if record:
            order = jnp.full((m, graph.n_keypoints), -1, jnp.int32)
            return poses, order, order
        return poses

    n = seeds['v'].shape[0]
    if not lane_chunk or n <= lane_chunk:
        return chunk(seeds)
    outs = []
    for start in range(0, n, lane_chunk):
        sl = {k: v[start:start + lane_chunk] for k, v in seeds.items()}
        if start == 0:
            outs.append(chunk(sl))
        else:
            outs.append(jax.lax.cond(
                jnp.any(sl['v'] > 0.0), chunk, empty_chunk, sl))
    if record:
        return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                     for i in range(3))
    return jnp.concatenate(outs, axis=0)


def grow_from_poses(caf, graph: SkeletonGraph, poses, *, lane_chunk=32,
                    **kwargs):
    """vmap of :func:`grow_from_pose` over (K, n_kp, 4) initial poses.

    Chunked like :func:`grow_poses`: all-empty lane chunks are skipped
    behind a ``lax.cond``.
    """
    record = kwargs.get('record_order', False)

    def chunk(pp):
        def one(pose0):
            out = grow_from_pose(caf, graph, pose0, **kwargs)
            any_filled = jnp.any(pose0[:, 0] > 0.0)
            if record:
                grown, ce, cs = out
                empty = jnp.full_like(ce, -1)
                return (jnp.where(any_filled, grown, jnp.zeros_like(grown)),
                        jnp.where(any_filled, ce, empty),
                        jnp.where(any_filled, cs, empty))
            return jnp.where(any_filled, out, jnp.zeros_like(out))
        return jax.vmap(one)(pp)

    def empty_chunk(p):
        if record:
            order = jnp.full(p.shape[:2], -1, jnp.int32)
            return jnp.zeros_like(p), order, order
        return jnp.zeros_like(p)

    n = poses.shape[0]
    if not lane_chunk or n <= lane_chunk:
        return chunk(poses)
    outs = []
    for start in range(0, n, lane_chunk):
        pp = poses[start:start + lane_chunk]
        if start == 0:
            outs.append(chunk(pp))
        else:
            outs.append(jax.lax.cond(
                jnp.any(pp[:, :, 0] > 0.0), chunk, empty_chunk, pp))
    if record:
        return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                     for i in range(3))
    return jnp.concatenate(outs, axis=0)


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
