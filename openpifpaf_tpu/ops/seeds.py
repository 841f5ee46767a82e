"""CifSeeds: seed extraction from CIF fields, rescored by CifHr.

Reference: ``csrc/src/cif_seeds.cpp:33-114``. Cells with confidence >=
threshold are rescored ``c' = 0.9 * cifhr(x, y) + 0.1 * c`` and sorted
descending. Here the scan + sort becomes a masked global top-k with a
static seed budget — plus an *exactness certificate*: the reference
keeps an unbounded seed list and skips seeds whose cell is occupied by
an already-grown pose (``cifcaf.cpp:206-211``); under a static budget,
a truncated candidate can only have lost a pose if no grown pose covers
its cell. :func:`occupancy_grid` / :func:`uncovered_any` turn that gate
into a post-hoc check, and the decoder escalates to a crowd-tier budget
whenever it fails, so truncation is always either provably harmless or
retried exactly.
"""

import jax
import jax.numpy as jnp

from .cifhr import cifhr_lookup, eval_cells


def cif_seeds(cif, hr, stride, *, threshold=0.2, n_seeds=256,
              rescore=True, seed_mask=None, nms=False, blob_compact=False,
              hr_cells=None, hr_shape=None,
              return_candidates=False):
    """Extract top-``n_seeds`` seeds.

    cif: (F, 5, H, W); hr: (F, HS, WS) materialized CifHr, or None with
    ``hr_cells``/``hr_shape`` set — the lazy splat-cell representation
    from :func:`cifhr.cif_hr_cells` is then evaluated directly at the
    seed positions (no map materialization, no gathers).
    Returns dict of arrays, all length ``n_seeds``, sorted by v descending:
      f (int32), v, x, y, s (hi-res pixels). Invalid seeds have v == 0.

    ``blob_compact`` keeps only cells that are 3x3 local maxima of their
    confidence plane before the budgeted top-k — an opt-in budget
    compaction for encoder-consistent fields (where all cells of one
    blob regress to the same target, so a blob's peak represents it
    exactly). It is NOT exact for arbitrary NN fields: neighboring
    cells can regress to different targets, and the reference grows a
    seed from every above-threshold cell (``cif_seeds.cpp:33-114``).
    Confidence-plateau ties are broken exactly (one survivor per
    plateau). Same pooling as the ``nms`` ablation, applied as a budget
    compaction rather than a scoring change.

    With ``return_candidates``, also returns ``cand``: a dict of dense
    (F * H * W,) arrays ``f``/``x``/``y`` plus bool ``dropped`` marking
    every candidate cell that could be a seed but was truncated by a
    static budget — either at the ``n_seeds`` top-k (exact rescored
    threshold) or already at the ``4 * n_seeds`` pre-rescore compaction
    (conservatively by raw threshold: those cells were never rescored).
    The decoder checks them against the grown poses' occupancy
    (:func:`uncovered_any`): a *covered* dropped candidate is one the
    reference's seed gate would have skipped anyway, so only an
    uncovered one forces escalation to a crowd-tier budget.
    """
    n_fields, _, h, w = cif.shape
    hw = h * w

    c = cif[:, 1].reshape(n_fields, hw)
    x = cif[:, 2].reshape(n_fields, hw) * stride
    y = cif[:, 3].reshape(n_fields, hw) * stride
    s = cif[:, 4].reshape(n_fields, hw) * stride

    mask = c >= threshold
    if seed_mask is not None:
        mask = mask & jnp.asarray(seed_mask, dtype=bool)[:, None]
    if nms or blob_compact:
        # --ablation-cifseeds-nms / blob_compact: keep only cells that
        # are 3x3 local maxima of the confidence plane
        # (cif_seeds.cpp:36-51)
        pooled = jax.lax.reduce_window(
            cif[:, 1], -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
            padding='SAME')
        peak = cif[:, 1] >= pooled
        if blob_compact and not nms:
            # Confidence plateaus (e.g. the encoder's constant-1.0 core
            # cells) make every plateau cell a ``>=`` peak, defeating the
            # compaction. Break ties exactly: two peaks within one 3x3
            # window necessarily have equal confidence (each bounds the
            # other), so "keep only the largest-linear-index peak in the
            # window" retains exactly one representative per plateau.
            idx2d = jnp.broadcast_to(
                jnp.arange(hw, dtype=jnp.int32).reshape(1, h, w),
                (n_fields, h, w))
            pooled_idx = jax.lax.reduce_window(
                jnp.where(peak, idx2d, -1), jnp.int32(-1), jax.lax.max,
                window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
                padding='SAME')
            peak = peak & (idx2d >= pooled_idx)
        mask = mask & peak.reshape(n_fields, hw)

    f_idx = jnp.broadcast_to(
        jnp.arange(n_fields, dtype=jnp.int32)[:, None], (n_fields, hw))
    c, x, y, s, f_idx = (a.reshape(-1) for a in (c, x, y, s, f_idx))
    mask = mask.reshape(-1)

    # compact the above-threshold cells to 4 * n_seeds BEFORE the CifHr
    # point gather: the rescore ``0.9 * hr + 0.1 * c`` only applies to
    # cells already >= threshold, so gathering hr for the full plane
    # (F * H * W points, the dominant cost of this stage on TPU) is
    # wasted on cells that can never become seeds. Cells beyond the
    # compaction width are the lowest-c cells; they join the dropped-
    # candidate set below (conservatively, by raw threshold) so the
    # decoder's occupancy check still certifies the result.
    mask_full = mask
    x_full, y_full, f_full = x, y, f_idx
    m = min(4 * n_seeds, c.shape[0])
    pre_v, pre_i = jax.lax.top_k(jnp.where(mask, c, -jnp.inf), m)
    x, y, s, f_idx = (a[pre_i] for a in (x, y, s, f_idx))
    if rescore:
        if hr_cells is not None:
            # lazy CifHr: pull each query's field-row of splat cells
            # (contiguous-K row gather) and evaluate in place
            rows = {k_: a[f_idx] for k_, a in hr_cells.items()}  # (M, K)
            hr_val = eval_cells(rows, x[:, None], y[:, None],
                                hs=hr_shape[0], ws=hr_shape[1],
                                default=-1.0)[:, 0]
        else:
            hr_val = cifhr_lookup(hr, f_idx, x, y, default=-1.0)
        v = 0.9 * hr_val + 0.1 * pre_v
    else:
        v = pre_v

    mask = jnp.isfinite(pre_v) & (v >= threshold)
    scored = jnp.where(mask, v, -jnp.inf)
    k = min(n_seeds, scored.shape[0])
    top_v, top_i = jax.lax.top_k(scored, k)

    valid = jnp.isfinite(top_v)
    out = {
        'f': jnp.where(valid, f_idx[top_i], 0),
        'v': jnp.where(valid, top_v, 0.0),
        'x': jnp.where(valid, x[top_i], 0.0),
        'y': jnp.where(valid, y[top_i], 0.0),
        's': jnp.where(valid, s[top_i], 0.0),
    }
    if return_candidates:
        n_full = mask_full.shape[0]
        # rescored candidates (the m compacted cells) dropped by the
        # n_seeds top-k, scattered back to the dense axis ...
        sel_m = jnp.zeros((m,), bool).at[top_i].set(True)
        dropped = jnp.zeros((n_full,), bool).at[pre_i].set(mask & ~sel_m)
        # ... plus cells the compaction itself truncated (never rescored;
        # counted conservatively by their raw threshold)
        in_m = jnp.zeros((n_full,), bool).at[pre_i].set(
            jnp.isfinite(pre_v))
        dropped = dropped | (mask_full & ~in_m)
        cand = {'f': f_full, 'x': x_full, 'y': y_full, 'dropped': dropped}
        return out, cand
    return out


def seed_nms(seeds, n_fields, hr_shape, *, n_keep, reduction=2.0,
             min_scale=4.0, occ0=None):
    """Greedy per-field occupancy suppression of redundant seeds.

    This replaces the reference's sequential "skip seed if occupied by an
    already-grown pose" gate (``cifcaf.cpp:206-211``): duplicate seeds of the
    same joint are suppressed before growth so that the parallel grower only
    expands a compact, high-value seed set. Poses that would additionally be
    suppressed by the reference's cross-joint occupancy are instead removed by
    the final keypoint NMS — and any seed that neither received a growth
    lane nor ends up covered by a grown pose raises the decoder's
    overflow flag (see :func:`uncovered_any`), so this compaction can
    never silently lose a pose.

    The greedy scan only ever *point*-queries the occupancy grid, so it is
    equivalent to a pairwise relation: seed j is rejected iff an accepted
    earlier seed i of the same field covers j's cell with its window. The
    acceptance closure of that relation is computed by fixpoint iteration
    (``accept_j = valid_j & !any(accept_i & covers[i, j])``), which converges
    to the sequential-greedy result in suppression-chain-depth rounds
    (typically 2-4) instead of one scan step per seed.

    Returns indices (n_keep,) into the seed arrays of accepted seeds, in
    descending score order, and a validity mask.
    """
    hs, ws = hr_shape
    gh = int(hs / reduction) + 1
    gw = int(ws / reduction) + 1
    n = seeds['v'].shape[0]

    f = seeds['f']
    v = seeds['v']
    x = seeds['x'] / reduction
    y = seeds['y'] / reduction
    sigma = jnp.maximum(min_scale / reduction, seeds['s'] / reduction)

    # grid cell each seed queries, and the window each accepted seed marks
    # ([x - sigma, x + sigma) like Occupancy::set, clamped to the grid)
    xi = jnp.clip(x.astype(jnp.int32), 0, gw - 1).astype(jnp.float32)
    yi = jnp.clip(y.astype(jnp.int32), 0, gh - 1).astype(jnp.float32)
    minx = jnp.clip(jnp.floor(x - sigma), 0, gw - 1)
    maxx = jnp.clip(jnp.floor(x + sigma), minx + 1, gw)
    miny = jnp.clip(jnp.floor(y - sigma), 0, gh - 1)
    maxy = jnp.clip(jnp.floor(y + sigma), miny + 1, gh)

    # covers[i, j]: would accepted seed i suppress seed j?
    covers = ((f[:, None] == f[None, :])
              & (xi[None, :] >= minx[:, None]) & (xi[None, :] < maxx[:, None])
              & (yi[None, :] >= miny[:, None]) & (yi[None, :] < maxy[:, None])
              & (jnp.arange(n)[:, None] < jnp.arange(n)[None, :]))

    valid = v > 0.0
    if occ0 is not None:
        # pre-marked occupancy (e.g. tracked poses): a plain point query
        xq = jnp.clip(x.astype(jnp.int32), 0, gw - 1)
        yq = jnp.clip(y.astype(jnp.int32), 0, gh - 1)
        valid = valid & ~occ0[f, yq, xq]

    def body(state):
        accept, _ = state
        new = valid & ~jnp.any(accept[:, None] & covers, axis=0)
        return new, jnp.any(new != accept)

    accept0 = valid
    accepted, _ = jax.lax.while_loop(
        lambda st: st[1], body, (accept0, jnp.array(True)))

    # stable top-n_keep accepted seeds: seeds are already sorted by v desc
    order_score = jnp.where(accepted, -jnp.arange(n, dtype=jnp.float32), -jnp.inf)
    _, keep_idx = jax.lax.top_k(order_score, min(n_keep, n))
    keep_valid = accepted[keep_idx] & (seeds['v'][keep_idx] > 0.0)
    return keep_idx, keep_valid


def seed_rank_dedup(poses, seed_f, seed_x, seed_y, valid, hr_shape, *,
                    n_initial=0, reduction=2.0, min_scale=4.0):
    """Accept/reject grown lanes exactly like the reference's seed gate.

    The reference decodes seeds in descending-score order and *skips* a
    seed whose cell is already covered by the occupancy of a previously
    grown pose (``cifcaf.cpp:206-211``; occupancy is marked from every
    visible joint of each grown pose right after its growth). Growth
    itself never reads occupancy, so the pose grown from any seed is
    independent of which other poses exist — which makes the sequential
    gate exactly reproducible *post hoc*: grow all lanes, then accept
    lane j iff no earlier-ranked ACCEPTED lane's pose has a visible
    joint ``seed_f[j]`` whose occupancy window covers seed j's cell.
    The acceptance closure of that relation is the same fixpoint
    argument as :func:`seed_nms` / :func:`nms.nms_keypoints`.

    Without this pass, duplicate lanes of one person (seeds on different
    joints all grow the same pose) are resolved by final-NMS pose score
    instead of seed rank — locations agree but every joint confidence
    inherits a different sqrt-chain provenance (measured deltas up to
    0.11 vs the reference on contested scenes; docs/perf.md).

    poses: (K, n_kp, 4) — ``n_initial`` initial/tracked lanes first
    (always accepted: the reference grows initial annotations before any
    seed, ``cifcaf.cpp:126-202``), then the seed lanes in seed-rank
    order. seed_f/x/y, valid: (K - n_initial,) for the seed lanes.
    Returns accept: (K,) bool.
    """
    k, n_kp, _ = poses.shape
    ks = k - n_initial
    hs, ws = hr_shape
    gh = int(hs / reduction) + 1
    gw = int(ws / reduction) + 1

    # each blocker lane i's joint seed_f[j], extracted for every seed
    # lane j: (K, Ks, 4) via one-hot contraction (exact 0/1 factors)
    onehot = (seed_f[:, None] == jnp.arange(n_kp)).astype(poses.dtype)
    rows = jnp.einsum('kna,jn->kja', poses, onehot,
                      precision=jax.lax.Precision.HIGHEST)
    jv = rows[..., 0]
    jx = rows[..., 1] / reduction
    jy = rows[..., 2] / reduction
    jsig = jnp.maximum(min_scale / reduction, rows[..., 3] / reduction)
    minx = jnp.clip(jnp.floor(jx - jsig), 0, gw - 1)
    maxx = jnp.clip(jnp.floor(jx + jsig), minx + 1, gw)
    miny = jnp.clip(jnp.floor(jy - jsig), 0, gh - 1)
    maxy = jnp.clip(jnp.floor(jy + jsig), miny + 1, gh)

    # seed j's query cell (same point-query semantics as uncovered_any)
    xi = jnp.clip((seed_x / reduction).astype(jnp.int32),
                  0, gw - 1).astype(jnp.float32)
    yi = jnp.clip((seed_y / reduction).astype(jnp.int32),
                  0, gh - 1).astype(jnp.float32)

    rank_i = jnp.arange(k)[:, None]          # blocker lane rank
    rank_j = n_initial + jnp.arange(ks)[None, :]  # seed lane rank
    covers = ((jv > 0.0)
              & (xi[None, :] >= minx) & (xi[None, :] < maxx)
              & (yi[None, :] >= miny) & (yi[None, :] < maxy)
              & (rank_i < rank_j))           # (K, Ks)

    always = jnp.arange(k) < n_initial
    valid_full = jnp.concatenate(
        [jnp.ones((n_initial,), bool), valid]) if n_initial else valid

    def body(state):
        accept, _ = state
        blocked = jnp.any(accept[:, None] & covers, axis=0)
        new = valid_full & (always | ~jnp.pad(blocked, (n_initial, 0)))
        return new, jnp.any(new != accept)

    accept0 = valid_full
    accept, _ = jax.lax.while_loop(
        lambda st: st[1], body, (accept0, jnp.array(True)))
    return accept


def occupancy_grid(poses, hr_shape, *, reduction=2.0, min_scale=4.0):
    """Occupancy grid (n_kp, gh, gw) marked by every joint (v > 0) of
    every pose, with ``Occupancy::set`` window semantics
    (``occupancy.cpp``: ``[x - sigma, x + sigma)`` clamped, sigma =
    max(min_scale, s), all in the reduced grid).

    Built as a summed-area table — a +-1 scatter at the four corners of
    each window followed by a 2-D inclusive cumsum — which is
    O(K * n_kp + grid) instead of the O(K * grid) per-pose scan of
    :func:`nms.mark_occupancy`, so it stays cheap at crowd-tier pose
    budgets.
    """
    k, n_kp, _ = poses.shape
    hs, ws = hr_shape
    gh = int(hs / reduction) + 1
    gw = int(ws / reduction) + 1

    v = poses[:, :, 0]
    x = poses[:, :, 1] / reduction
    y = poses[:, :, 2] / reduction
    sigma = jnp.maximum(min_scale / reduction, poses[:, :, 3] / reduction)
    minx = jnp.clip(jnp.floor(x - sigma), 0, gw - 1).astype(jnp.int32)
    maxx = jnp.clip(jnp.floor(x + sigma), minx + 1, gw).astype(jnp.int32)
    miny = jnp.clip(jnp.floor(y - sigma), 0, gh - 1).astype(jnp.int32)
    maxy = jnp.clip(jnp.floor(y + sigma), miny + 1, gh).astype(jnp.int32)

    val = (v > 0.0).astype(jnp.int32)
    f = jnp.broadcast_to(jnp.arange(n_kp, dtype=jnp.int32)[None, :],
                         (k, n_kp))
    corners = jnp.zeros((n_kp, gh + 1, gw + 1), jnp.int32)
    corners = corners.at[f, miny, minx].add(val)
    corners = corners.at[f, miny, maxx].add(-val)
    corners = corners.at[f, maxy, minx].add(-val)
    corners = corners.at[f, maxy, maxx].add(val)
    counts = jnp.cumsum(jnp.cumsum(corners, axis=1), axis=2)
    return counts[:, :gh, :gw] > 0


def uncovered_any(f, x, y, mask, occ, *, reduction=2.0):
    """True when any masked candidate's grid cell is NOT covered by
    ``occ`` (from :func:`occupancy_grid`).

    This is the reference's seed gate (``cifcaf.cpp:206-211``: a seed in
    a cell already occupied by a grown pose is skipped, losslessly)
    turned into a post-hoc exactness check: a candidate that a static
    budget truncated can only have lost a pose if no grown pose covers
    its cell — the same point-query semantics as the gate itself.
    """
    gh, gw = occ.shape[1], occ.shape[2]
    xi = jnp.clip((x / reduction).astype(jnp.int32), 0, gw - 1)
    yi = jnp.clip((y / reduction).astype(jnp.int32), 0, gh - 1)
    return jnp.any(mask & ~occ[f, yi, xi])
