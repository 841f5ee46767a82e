"""CifSeeds: seed extraction from CIF fields, rescored by CifHr.

Reference: ``csrc/src/cif_seeds.cpp:33-114``. Cells with confidence >=
threshold are rescored ``c' = 0.9 * cifhr(x, y) + 0.1 * c`` and sorted
descending. Here the scan + sort becomes a masked global top-k with a
static seed budget.
"""

import jax
import jax.numpy as jnp

from .cifhr import cifhr_lookup, eval_cells


def cif_seeds(cif, hr, stride, *, threshold=0.2, n_seeds=256,
              rescore=True, seed_mask=None, nms=False,
              hr_cells=None, hr_shape=None,
              return_overflow=False):
    """Extract top-``n_seeds`` seeds.

    cif: (F, 5, H, W); hr: (F, HS, WS) materialized CifHr, or None with
    ``hr_cells``/``hr_shape`` set — the lazy splat-cell representation
    from :func:`cifhr.cif_hr_cells` is then evaluated directly at the
    seed positions (no map materialization, no gathers).
    Returns dict of arrays, all length ``n_seeds``, sorted by v descending:
      f (int32), v, x, y, s (hi-res pixels). Invalid seeds have v == 0.

    With ``return_overflow`` also returns a bool scalar: True when more
    than ``4 * n_seeds`` cells passed the threshold, i.e. the pre-rescore
    compaction may have dropped a candidate and the caller should
    escalate to a crowd-tier budget.
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
    if nms:
        # --ablation-cifseeds-nms: keep only cells that are 3x3 local
        # maxima of the confidence plane (cif_seeds.cpp:36-51)
        pooled = jax.lax.reduce_window(
            cif[:, 1], -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
            padding='SAME')
        mask = mask & (cif[:, 1] >= pooled).reshape(n_fields, hw)

    f_idx = jnp.broadcast_to(
        jnp.arange(n_fields, dtype=jnp.int32)[:, None], (n_fields, hw))
    c, x, y, s, f_idx = (a.reshape(-1) for a in (c, x, y, s, f_idx))
    mask = mask.reshape(-1)

    overflow = jnp.array(False)
    if rescore:
        # compact the above-threshold cells to 4 * n_seeds BEFORE the
        # CifHr point gather: the rescore ``0.9 * hr + 0.1 * c`` only
        # applies to cells already >= threshold, so gathering hr for the
        # full plane (F * H * W points, the dominant cost of this stage on
        # TPU) is wasted on cells that can never become seeds. Exact
        # whenever at most 4 * n_seeds cells pass the threshold (dropped
        # cells are the lowest-c cells; they could only outrank a kept one
        # via a higher CifHr value at a *different* joint location, which
        # requires ~4 * n_seeds active cells = far beyond the scene the
        # fast-tier budgets are sized for); truncation raises overflow.
        m = min(4 * n_seeds, c.shape[0])
        overflow = jnp.sum(mask) > m
        pre_v, pre_i = jax.lax.top_k(jnp.where(mask, c, -jnp.inf), m)
        x, y, s, f_idx = (a[pre_i] for a in (x, y, s, f_idx))
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
        mask = jnp.isfinite(pre_v)
    else:
        v = c

    mask = mask & (v >= threshold)
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
    if return_overflow:
        return out, overflow
    return out


def seed_nms(seeds, n_fields, hr_shape, *, n_keep, reduction=2.0,
             min_scale=4.0, occ0=None):
    """Greedy per-field occupancy suppression of redundant seeds.

    This replaces the reference's sequential "skip seed if occupied by an
    already-grown pose" gate (``cifcaf.cpp:206-211``): duplicate seeds of the
    same joint are suppressed before growth so that the parallel grower only
    expands a compact, high-value seed set. Poses that would additionally be
    suppressed by the reference's cross-joint occupancy are instead removed by
    the final keypoint NMS.

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
