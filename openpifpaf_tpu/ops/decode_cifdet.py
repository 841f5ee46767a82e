"""CifDet decode pipeline (detection).

Reference: ``csrc/src/cifdet.cpp:24-80`` + ``decoder/cifdet.py:48-88``.
CifDetHr accumulation (sigma = max(1, 0.1 * min(w, h) * stride),
``cif_hr.cpp:124-150``), seed extraction with rescoring, greedy
occupancy-filtered box extraction, then category-aware IoU NMS with score
suppression.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from . import cifhr as cifhr_mod



@dataclasses.dataclass(frozen=True)
class CifDetDecoderConfig:
    cifhr_threshold: float = 0.3
    cifhr_neighbors: int = 16
    cifhr_min_scale: float = 0.0
    seed_threshold: float = 0.2
    iou_threshold: float = 0.5
    nms_by_category: bool = True
    suppression: float = 0.1
    instance_threshold: float = 0.15
    occupancy_reduction: float = 2.0
    occupancy_min_scale: float = 4.0
    n_hr_cells: int = 256
    n_seeds: int = 256
    n_detections: int = 120


def select_det_cells(cifdet, stride, *, threshold, min_scale, n_cells):
    """Top cells for CifDetHr. cifdet: (F, 6, H, W) [logb, c, x, y, w, h]."""
    n_fields, _, h, w = cifdet.shape
    hw = h * w
    v = cifdet[:, 1].reshape(n_fields, hw)
    ww = cifdet[:, 4].reshape(n_fields, hw)
    hh = cifdet[:, 5].reshape(n_fields, hw)
    valid = (v >= threshold) & (ww >= min_scale / stride) & (hh >= min_scale / stride)

    scored = jnp.where(valid, v, -jnp.inf)
    top_v, top_i = jax.lax.top_k(scored, min(n_cells, hw))
    # one-hot matmul payload extraction (see caf_scored: exact, and avoids
    # TPU-serialized take_along_axis gathers)
    onehot = (top_i[..., None] == jnp.arange(hw)).astype(jnp.float32)
    payload = cifdet[:, 2:6].reshape(n_fields, 4, hw)
    out = jnp.einsum('fkc,fpc->fkp', onehot, payload,
                     precision=jax.lax.Precision.HIGHEST)
    x = out[..., 0] * stride
    y = out[..., 1] * stride
    sigma = jnp.maximum(1.0, 0.1 * jnp.minimum(out[..., 2],
                                               out[..., 3]) * stride)
    weight = jnp.where(jnp.isfinite(top_v), top_v, 0.0)
    return x, y, sigma, weight


def box_iou(boxes_a, boxes_b):
    """IoU between two sets of xyxy boxes: (A, 4) x (B, 4) -> (A, B)."""
    ax0, ay0, ax1, ay1 = [boxes_a[:, i][:, None] for i in range(4)]
    bx0, by0, bx1, by1 = [boxes_b[:, i][None, :] for i in range(4)]
    inter_w = jnp.maximum(0.0, jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0))
    inter_h = jnp.maximum(0.0, jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0))
    inter = inter_w * inter_h
    area_a = jnp.maximum(0.0, ax1 - ax0) * jnp.maximum(0.0, ay1 - ay0)
    area_b = jnp.maximum(0.0, bx1 - bx0) * jnp.maximum(0.0, by1 - by0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def decode_cifdet_single(cifdet, *, stride, config):
    cfg = config
    n_fields, _, h, w = cifdet.shape
    hw = h * w
    hr_shape = ((h - 1) * stride + 1, (w - 1) * stride + 1)

    # CifDetHr, kept lazy (splat cells; see cifhr.eval_cells) — the 80-class
    # map would be 131 MB at 641px and is only ever point-read here
    x, y, sigma, wgt = select_det_cells(
        cifdet, stride, threshold=cfg.cifhr_threshold,
        min_scale=cfg.cifhr_min_scale, n_cells=cfg.n_hr_cells)
    hr_cells = {'x': x, 'y': y, 'sigma': sigma,
                'w': wgt / cfg.cifhr_neighbors}

    # seeds (cif_seeds.cpp:69-90): v = 0.9 * hr + 0.1 * c, with the
    # rescore restricted to the top 4*n_seeds above-threshold cells
    # (the same pre-rescore compaction as cif_seeds)
    c = cifdet[:, 1].reshape(-1)
    sx = cifdet[:, 2].reshape(-1) * stride
    sy = cifdet[:, 3].reshape(-1) * stride
    sw = cifdet[:, 4].reshape(-1) * stride
    sh = cifdet[:, 5].reshape(-1) * stride
    f_idx = jnp.broadcast_to(
        jnp.arange(n_fields, dtype=jnp.int32)[:, None],
        (n_fields, hw)).reshape(-1)
    mask = c >= cfg.seed_threshold

    m = min(4 * cfg.n_seeds, c.shape[0])
    pre_v, pre_i = jax.lax.top_k(jnp.where(mask, c, -jnp.inf), m)
    sx, sy, sw, sh, f_idx = (a[pre_i] for a in (sx, sy, sw, sh, f_idx))
    rows = {k_: a[f_idx] for k_, a in hr_cells.items()}
    hr_val = cifhr_mod.eval_cells(rows, sx[:, None], sy[:, None],
                                  hs=hr_shape[0], ws=hr_shape[1],
                                  default=-1.0)[:, 0]
    v = 0.9 * hr_val + 0.1 * pre_v
    mask = jnp.isfinite(pre_v) & (v >= cfg.seed_threshold)

    scored = jnp.where(mask, v, -jnp.inf)
    top_v, top_i = jax.lax.top_k(scored, min(cfg.n_seeds, scored.shape[0]))
    valid = jnp.isfinite(top_v)
    seed_f = jnp.where(valid, f_idx[top_i], 0)
    seed_v = jnp.where(valid, top_v, 0.0)
    seed_x = sx[top_i]
    seed_y = sy[top_i]
    seed_w = sw[top_i]
    seed_h = sh[top_i]

    # greedy occupancy extraction (cifdet.cpp:50-65)
    red = cfg.occupancy_reduction
    gh = int(hr_shape[0] / red) + 1
    gw = int(hr_shape[1] / red) + 1
    ys_grid = jnp.arange(gh, dtype=jnp.float32)[:, None]
    xs_grid = jnp.arange(gw, dtype=jnp.float32)[None, :]

    def body(carry, i):
        occ, n_accepted = carry
        f = seed_f[i]
        xg = seed_x[i] / red
        yg = seed_y[i] / red
        sig = jnp.maximum(cfg.occupancy_min_scale / red,
                          0.1 * jnp.minimum(seed_w[i], seed_h[i]) / red)
        xi = jnp.clip(xg.astype(jnp.int32), 0, gw - 1)
        yi = jnp.clip(yg.astype(jnp.int32), 0, gh - 1)
        occupied = occ[f, yi, xi]
        accept = ((seed_v[i] > 0.0) & ~occupied
                  & (n_accepted < cfg.n_detections))

        minx = jnp.clip(jnp.floor(xg - sig), 0, gw - 1)
        maxx = jnp.clip(jnp.floor(xg + sig), minx + 1, gw)
        miny = jnp.clip(jnp.floor(yg - sig), 0, gh - 1)
        maxy = jnp.clip(jnp.floor(yg + sig), miny + 1, gh)
        window = ((ys_grid >= miny) & (ys_grid < maxy)
                  & (xs_grid >= minx) & (xs_grid < maxx))
        occ = jnp.where(accept, occ.at[f].set(occ[f] | window), occ)
        return (occ, n_accepted + accept.astype(jnp.int32)), accept

    occ0 = jnp.zeros((n_fields, gh, gw), dtype=bool)
    (_, _), accepted = jax.lax.scan(
        body, (occ0, jnp.int32(0)), jnp.arange(seed_v.shape[0]))

    det_scores = jnp.where(accepted, seed_v, 0.0)
    boxes = jnp.stack([
        seed_x - 0.5 * seed_w, seed_y - 0.5 * seed_h,
        seed_x + 0.5 * seed_w, seed_y + 0.5 * seed_h], axis=1)

    # IoU NMS with suppression (decoder/cifdet.py:60-72)
    n = det_scores.shape[0]
    order = jnp.argsort(-det_scores)
    s_sorted = det_scores[order]
    b_sorted = boxes[order]
    f_sorted = seed_f[order]
    iou = box_iou(b_sorted, b_sorted)
    if cfg.nms_by_category:
        iou = jnp.where(f_sorted[:, None] == f_sorted[None, :], iou, 0.0)

    def nms_body(keep, i):
        suppressed_by_earlier = jnp.any(
            keep & (jnp.arange(n) < i) & (iou[i] > cfg.iou_threshold))
        ki = (s_sorted[i] > 0.0) & ~suppressed_by_earlier
        keep = keep.at[i].set(ki)
        return keep, None

    keep0 = jnp.zeros((n,), dtype=bool)
    keep_sorted, _ = jax.lax.scan(nms_body, keep0, jnp.arange(n))

    final_scores = jnp.where(keep_sorted, s_sorted, s_sorted * cfg.suppression)
    final_keep = final_scores > cfg.instance_threshold

    inverse = jnp.argsort(order)
    return {
        'category': seed_f + 1,
        'score': final_scores[inverse],
        'box': boxes,
        'keep': final_keep[inverse],
    }


def build_cifdet_decoder(*, stride, config=None):
    config = config or CifDetDecoderConfig()
    single = functools.partial(decode_cifdet_single, stride=stride,
                               config=config)

    @jax.jit
    def decode(cifdet):
        return jax.vmap(single)(cifdet)

    return decode
