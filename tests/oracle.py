"""Sequential numpy oracle of the reference decoder semantics.

Independent re-implementation (from the documented semantics of
``/root/reference/src/openpifpaf/csrc``) used to validate the vectorized
JAX decoder in ``openpifpaf_tpu.ops`` on synthetic fields. Deliberately
written in the straightforward sequential style so that it is easy to audit
against the C++ behavior.
"""

import heapq

import numpy as np


def approx_exp(x):
    if x > 2.0 or x < -2.0:
        return 0.0
    x = 1.0 + x / 8.0
    x *= x
    x *= x
    x *= x
    return x


def cif_hr(cif, stride, *, threshold=0.3, neighbors=16, min_scale=0.0,
           factor=1.0):
    n_fields, _, h, w = cif.shape
    hs = (h - 1) * stride + 1
    ws = (w - 1) * stride + 1
    acc = np.zeros((n_fields, hs, ws), dtype=np.float32)

    for f in range(n_fields):
        for j in range(h):
            for i in range(w):
                v = cif[f, 1, j, i]
                if v < threshold:
                    continue
                scale = cif[f, 4, j, i]
                if scale < min_scale / stride:
                    continue
                x = cif[f, 2, j, i] * stride
                y = cif[f, 3, j, i] * stride
                sigma = max(1.0, 0.5 * scale * stride)
                vv = v / neighbors * factor

                minx = int(np.clip(int(x - sigma), 0, ws - 1))
                miny = int(np.clip(int(y - sigma), 0, hs - 1))
                maxx = int(np.clip(int(x + sigma + 1), minx + 1, ws))
                maxy = int(np.clip(int(y + sigma + 1), miny + 1, hs))
                s2 = sigma * sigma
                for xx in range(minx, maxx):
                    dx2 = (xx - x) ** 2
                    for yy in range(miny, maxy):
                        dy2 = (yy - y) ** 2
                        if dx2 + dy2 > s2:
                            continue
                        if dx2 < 0.25 and dy2 < 0.25:
                            g = vv
                        else:
                            g = vv * approx_exp(-0.5 * (dx2 + dy2) / s2)
                        acc[f, yy, xx] = min(acc[f, yy, xx] + g, 1.0)
    return acc


def cifhr_value(hr, f, x, y, default=-1.0):
    hs, ws = hr.shape[1], hr.shape[2]
    if f >= hr.shape[0] or x < -0.49 or y < -0.49 \
       or x > ws - 0.51 or y > hs - 0.51:
        return default
    value = hr[f, int(y + 0.5), int(x + 0.5)]
    if value < 0.0:
        return default
    return value


def cif_seeds(cif, hr, stride, *, threshold=0.2):
    seeds = []
    n_fields, _, h, w = cif.shape
    for f in range(n_fields):
        for j in range(h):
            for i in range(w):
                c = cif[f, 1, j, i]
                if c < threshold:
                    continue
                x = cif[f, 2, j, i] * stride
                y = cif[f, 3, j, i] * stride
                c = 0.9 * cifhr_value(hr, f, x, y) + 0.1 * c
                if c < threshold:
                    continue
                s = cif[f, 4, j, i] * stride
                seeds.append((f, c, x, y, s))
    seeds.sort(key=lambda s: -s[1])
    return seeds


def caf_scored(caf, hr, stride, skeleton, *, score_th=0.3, cif_floor=0.1):
    """Per-edge forward/backward candidate lists:
    each candidate is (c, x1, y1, x2, y2, s1, s2)."""
    n_edges = caf.shape[0]
    forward = [[] for _ in range(n_edges)]
    backward = [[] for _ in range(n_edges)]
    _, _, h, w = caf.shape
    for f in range(n_edges):
        j1 = skeleton[f][0] - 1
        j2 = skeleton[f][1] - 1
        for j in range(h):
            for i in range(w):
                c = caf[f, 1, j, i]
                if c < score_th:
                    continue
                x1 = caf[f, 2, j, i] * stride
                y1 = caf[f, 3, j, i] * stride
                x2 = caf[f, 4, j, i] * stride
                y2 = caf[f, 5, j, i] * stride
                s1 = caf[f, 6, j, i] * stride
                s2 = caf[f, 7, j, i] * stride

                fwd_hr = cifhr_value(hr, j2, x2, y2, 0.0)
                bwd_hr = cifhr_value(hr, j1, x1, y1, 0.0)
                cf = c * (cif_floor + (1.0 - cif_floor) * fwd_hr)
                cb = c * (cif_floor + (1.0 - cif_floor) * bwd_hr)
                if cf > score_th:
                    forward[f].append((cf, x1, y1, x2, y2, s1, s2))
                if cb > score_th:
                    backward[f].append((cb, x2, y2, x1, y1, s2, s1))
    return forward, backward


def grow_connection_blend(candidates, x, y, xy_scale, filter_sigmas=1.0,
                          only_max=False):
    xy_scale = max(xy_scale, 0.5)
    sigma_filter = filter_sigmas * xy_scale / 2.0
    sigma2 = 0.25 * xy_scale * xy_scale

    score_1, score_2 = 0.0, 0.0
    entry_1, entry_2 = None, None
    for cand in candidates:
        c, sx, sy, tx, ty, _, ts = cand
        if sx < x - sigma_filter or sx > x + sigma_filter:
            continue
        if sy < y - sigma_filter or sy > y + sigma_filter:
            continue
        d2 = (sx - x) ** 2 + (sy - y) ** 2
        score = np.exp(-0.5 * d2 / sigma2) * c
        if score >= score_1:
            score_2, entry_2 = score_1, entry_1
            score_1, entry_1 = score, cand
        elif score > score_2:
            score_2, entry_2 = score, cand

    if score_1 == 0.0:
        return 0.0, 0.0, 0.0, 0.0

    e1 = (entry_1[3], entry_1[4], max(0.0, entry_1[6]))
    if only_max:
        return score_1, e1[0], e1[1], e1[2]
    if score_2 < 0.01 or score_2 < 0.5 * score_1:
        return 0.5 * score_1, e1[0], e1[1], e1[2]

    e2 = (entry_2[3], entry_2[4], max(0.0, entry_2[6]))
    blend_d2 = (e1[0] - e2[0]) ** 2 + (e1[1] - e2[1]) ** 2
    if blend_d2 > e1[2] ** 2 / 4.0:
        return 0.5 * score_1, e1[0], e1[1], e1[2]

    total = score_1 + score_2
    return (0.5 * total,
            (score_1 * e1[0] + score_2 * e2[0]) / total,
            (score_1 * e1[1] + score_2 * e2[1]) / total,
            (score_1 * e1[2] + score_2 * e2[2]) / total)


class Occupancy:
    def __init__(self, n_fields, hs, ws, reduction=2.0, min_scale=4.0):
        self.reduction = reduction
        self.min_scale_reduced = min_scale / reduction
        gh = int(hs / reduction) + 1
        gw = int(ws / reduction) + 1
        self.grid = np.zeros((n_fields, gh, gw), dtype=bool)

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


def connection_value(pose, caf_fb, skeleton, start_i, end_i, *,
                     keypoint_threshold=0.15, keypoint_threshold_rel=0.5,
                     reverse_match=True, filter_sigmas=1.0):
    caf_i, forward = None, None
    for f, (p0, p1) in enumerate(skeleton):
        if p0 - 1 == start_i and p1 - 1 == end_i:
            caf_i, forward = f, True
            break
        if p1 - 1 == start_i and p0 - 1 == end_i:
            caf_i, forward = f, False
            break
    caf_f = caf_fb[0][caf_i] if forward else caf_fb[1][caf_i]
    caf_b = caf_fb[1][caf_i] if forward else caf_fb[0][caf_i]

    sv, sx, sy, ss = pose[start_i]
    nv, nx, ny, ns = grow_connection_blend(caf_f, sx, sy, ss, filter_sigmas)
    if nv == 0.0:
        return 0.0, 0.0, 0.0, 0.0

    nv = np.sqrt(nv * sv)
    if nv < keypoint_threshold or nv < sv * keypoint_threshold_rel:
        return 0.0, 0.0, 0.0, 0.0

    if reverse_match:
        rv, rx, ry, _ = grow_connection_blend(caf_b, nx, ny, ns, filter_sigmas)
        if rv == 0.0:
            return 0.0, 0.0, 0.0, 0.0
        if abs(sx - rx) + abs(sy - ry) > ss:
            return 0.0, 0.0, 0.0, 0.0
    return nv, nx, ny, ns


def grow(pose, caf_fb, skeleton, n_keypoints, **kwargs):
    """Priority-queue frontier growth (reference _grow, non-greedy)."""
    frontier = []
    in_frontier = set()
    counter = [0]

    def add_from(start_i):
        max_score = np.sqrt(pose[start_i][0])
        for p0, p1 in skeleton:
            for a, b in ((p0 - 1, p1 - 1), (p1 - 1, p0 - 1)):
                if a != start_i or pose[b][0] > 0.0 or (a, b) in in_frontier:
                    continue
                counter[0] += 1
                heapq.heappush(frontier, (-max_score, counter[0], None, a, b))
                in_frontier.add((a, b))

    for j in range(n_keypoints):
        if pose[j][0] > 0.0:
            add_from(j)

    while frontier:
        _, _, joint, start_i, end_i = heapq.heappop(frontier)
        if pose[end_i][0] > 0.0:
            continue
        if joint is None:
            nv, nx, ny, ns = connection_value(
                pose, caf_fb, skeleton, start_i, end_i, **kwargs)
            if nv == 0.0:
                continue
            counter[0] += 1
            heapq.heappush(frontier, (-nv, counter[0], (nv, nx, ny, ns),
                                      start_i, end_i))
            continue
        pose[end_i] = list(joint)
        add_from(end_i)


def nms_keypoints(poses, occupancy, *, suppression=1e-5,
                  instance_threshold=0.15, keypoint_threshold=0.15):
    poses.sort(key=lambda p: -np.mean([j[0] for j in p]))
    for pose in poses:
        for f, joint in enumerate(pose):
            if joint[0] == 0.0:
                continue
            if occupancy.get(f, joint[1], joint[2]):
                joint[0] *= suppression
            else:
                occupancy.set(f, joint[1], joint[2], joint[3])
    for pose in poses:
        for joint in pose:
            if joint[0] <= keypoint_threshold:
                joint[0] = 0.0
    poses = [p for p in poses
             if np.mean([j[0] for j in p]) >= instance_threshold]
    poses.sort(key=lambda p: -np.mean([j[0] for j in p]))
    return poses


def flood_fill(pose, skeleton, n_keypoints):
    """Copy filled joints into empty neighbors (cifcaf.cpp:429-449)."""
    frontier = []
    in_frontier = set()
    counter = [0]

    def add_from(start_i):
        max_score = np.sqrt(pose[start_i][0])
        for p0, p1 in skeleton:
            for a, b in ((p0 - 1, p1 - 1), (p1 - 1, p0 - 1)):
                if a != start_i or pose[b][0] > 0.0 or (a, b) in in_frontier:
                    continue
                counter[0] += 1
                heapq.heappush(frontier, (-max_score, counter[0], a, b))
                in_frontier.add((a, b))

    for j in range(n_keypoints):
        if pose[j][0] > 0.0:
            add_from(j)

    while frontier:
        _, _, start_i, end_i = heapq.heappop(frontier)
        if pose[end_i][0] > 0.0:
            continue
        pose[end_i] = [1e-5, pose[start_i][1], pose[start_i][2],
                       pose[start_i][3]]
        add_from(end_i)


def decode_cifcaf(cif, caf, stride, skeleton, n_keypoints, *,
                  seed_occupancy_skip=True, force_complete=False,
                  force_complete_caf_th=0.001,
                  keypoint_threshold=0.15, keypoint_threshold_rel=0.5,
                  nms_keypoint_threshold=None, **kwargs):
    """Full sequential decode. Returns list of (n_kp, 4) [v, x, y, s]."""
    if force_complete:
        keypoint_threshold = 0.0
        keypoint_threshold_rel = 0.0
        if nms_keypoint_threshold is None:
            nms_keypoint_threshold = 0.0
    if nms_keypoint_threshold is None:
        nms_keypoint_threshold = keypoint_threshold

    hr = cif_hr(cif, stride)
    seeds = cif_seeds(cif, hr, stride)
    caf_fb = caf_scored(caf, hr, stride, skeleton)

    hs, ws = hr.shape[1:]
    occupancy = Occupancy(n_keypoints, hs, ws)
    poses = []
    for f, v, x, y, s in seeds:
        if seed_occupancy_skip and occupancy.get(f, x, y):
            continue
        pose = [[0.0, 0.0, 0.0, 0.0] for _ in range(n_keypoints)]
        pose[f] = [v, x, y, s]
        grow(pose, caf_fb, skeleton, n_keypoints,
             keypoint_threshold=keypoint_threshold,
             keypoint_threshold_rel=keypoint_threshold_rel, **kwargs)
        for of in range(n_keypoints):
            if pose[of][0] == 0.0:
                continue
            occupancy.set(of, pose[of][1], pose[of][2], pose[of][3])
        poses.append(pose)

    if force_complete:
        caf_fb_low = caf_scored(caf, hr, stride, skeleton,
                                score_th=force_complete_caf_th)
        for pose in poses:
            grow(pose, caf_fb_low, skeleton, n_keypoints,
                 keypoint_threshold=keypoint_threshold,
                 keypoint_threshold_rel=keypoint_threshold_rel,
                 reverse_match=False, filter_sigmas=4.0)
        for pose in poses:
            flood_fill(pose, skeleton, n_keypoints)

    nms_occ = Occupancy(n_keypoints, hs, ws)
    poses = nms_keypoints(poses, nms_occ,
                          keypoint_threshold=nms_keypoint_threshold)
    return [np.asarray(p, dtype=np.float32) for p in poses]
