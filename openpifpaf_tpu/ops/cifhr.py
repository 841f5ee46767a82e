"""CifHr: high-resolution accumulation of CIF fields.

Reference semantics (``csrc/src/cif_hr.cpp:28-121``): every CIF cell with
confidence >= threshold splats a truncated Gaussian (custom ``approx_exp``,
8-term approximation, ``cif_hr.cpp:18-25``) of amplitude ``v / neighbors``
centered at the stride-upscaled regressed position ``(x, y)`` with
``sigma = max(1, 0.5 * scale * stride)``, truncated at 1 sigma. The
sequential per-pixel update ``entry = min(max(entry, rev) + vv, rev + 1)``
is order-independent for non-negative contributions, so the whole map is

    hr[f, Y, X] = min(1, sum_k w_k * g_k(X, Y))

which is embarrassingly parallel — ideal for TPU. We bound work with a
static top-K selection of contributing cells per field (typical images have
far fewer cells above threshold than K; masked-out cells contribute 0).
"""

import jax
import jax.numpy as jnp


def approx_exp(x):
    """8-term exp approximation, bit-matching ``cif_hr.cpp:18-25``."""
    y = 1.0 + x / 8.0
    y = y * y
    y = y * y
    y = y * y
    return jnp.where((x > 2.0) | (x < -2.0), 0.0, y)


def select_cells(cif, stride, *, threshold, min_scale, n_cells):
    """Top-``n_cells`` contributing cells per field.

    cif: (F, 5, H, W) decoded CIF field [logb, conf, x, y, scale].
    Returns (x, y, sigma, w, overflow): each (F, n_cells), positions in
    hi-res pixels, invalid cells have w == 0; overflow is a bool scalar —
    True when any field had more valid cells than the static budget kept.
    """
    n_fields, _, h, w = cif.shape
    v = cif[:, 1].reshape(n_fields, h * w)
    scale = cif[:, 4].reshape(n_fields, h * w)
    valid = (v >= threshold) & (scale >= min_scale / stride)

    scored = jnp.where(valid, v, -jnp.inf)
    k = min(n_cells, h * w)
    top_v, top_i = jax.lax.top_k(scored, k)
    overflow = jnp.any(jnp.sum(valid, axis=1) > k)

    # one-hot matmul payload extraction (TPU serializes per-row gathers;
    # exact because the one-hot factor is exactly 1.0/0.0 — see caf_scored)
    onehot = (top_i[..., None] == jnp.arange(h * w)).astype(jnp.float32)
    payload = cif[:, 2:5].reshape(n_fields, 3, h * w)
    out = jnp.einsum('fkc,fpc->fkp', onehot, payload,
                     precision=jax.lax.Precision.HIGHEST)
    x = out[..., 0] * stride
    y = out[..., 1] * stride
    sigma = jnp.maximum(1.0, 0.5 * out[..., 2] * stride)
    weight = jnp.where(jnp.isfinite(top_v), top_v, 0.0)
    return x, y, sigma, weight, overflow


def accumulate_dense(x, y, sigma, w, *, hr_h, hr_w, neighbors=16, factor=1.0):
    """Reference jnp implementation: loop over cells, full-map accumulate.

    Exact but bandwidth-bound; used for tests and as CPU fallback. The
    production path is the Pallas tiled kernel in :mod:`cifhr_pallas`.
    """
    n_fields, n_cells = x.shape
    xs = jnp.arange(hr_w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(hr_h, dtype=jnp.float32)[None, :, None]

    def body(k, acc):
        cx = x[:, k][:, None, None]
        cy = y[:, k][:, None, None]
        cs = sigma[:, k][:, None, None]
        cw = (w[:, k] / neighbors * factor)[:, None, None]

        dx2 = (xs - cx) ** 2
        dy2 = (ys - cy) ** 2
        d2 = dx2 + dy2
        inside = d2 <= cs * cs
        closest = (dx2 < 0.25) & (dy2 < 0.25)
        g = jnp.where(closest, 1.0, approx_exp(-0.5 * d2 / (cs * cs)))
        return acc + jnp.where(inside, cw * g, 0.0)

    acc = jax.lax.fori_loop(
        0, n_cells, body,
        jnp.zeros((n_fields, hr_h, hr_w), dtype=jnp.float32))
    return jnp.minimum(acc, 1.0)


def cif_hr(cif, stride, *, threshold=0.3, min_scale=0.0, neighbors=16,
           factor=1.0, n_cells=256, impl='auto', exact_tiles=False,
           return_overflow=False):
    """Full CifHr from a decoded CIF field. Returns (F, HS, WS).

    impl: 'auto' (Pallas on TPU, dense jnp elsewhere), 'pallas' or 'dense'.
    With ``return_overflow`` also returns a bool scalar: True when a field
    had more cells above the threshold than the static ``n_cells`` budget
    splats, or (Pallas path) a tile intersected more cells than its
    compaction budget — either way the accumulated map may underestimate
    and the caller should escalate. ``exact_tiles`` disables the Pallas
    per-tile compaction bound (the decoder's crowd tier sets it).
    """
    _, _, h, w = cif.shape
    hr_h = (h - 1) * stride + 1
    hr_w = (w - 1) * stride + 1
    x, y, sigma, wgt, overflow = select_cells(
        cif, stride, threshold=threshold, min_scale=min_scale, n_cells=n_cells)

    if impl == 'auto':
        impl = 'pallas' if jax.default_backend() not in ('cpu',) else 'dense'
    if impl == 'pallas':
        from .cifhr_pallas import accumulate_pallas
        hr, tile_overflow = accumulate_pallas(
            x, y, sigma, wgt, hr_h=hr_h, hr_w=hr_w,
            neighbors=neighbors, factor=factor,
            k_tile=n_cells if exact_tiles else None,
            return_overflow=True)
        overflow = overflow | tile_overflow
    else:
        hr = accumulate_dense(x, y, sigma, wgt, hr_h=hr_h, hr_w=hr_w,
                              neighbors=neighbors, factor=factor)
    if return_overflow:
        return hr, overflow
    return hr


def cif_hr_cells(cif, stride, *, threshold=0.3, min_scale=0.0, neighbors=16,
                 factor=1.0, n_cells=256):
    """Lazy CifHr: the splat-cell representation instead of the full map.

    The decode pipeline only ever *point-reads* CifHr (seed rescoring,
    CAF candidate rescoring), so materializing the (F, HS, WS) map — 28 MB
    for COCO-17 at 641px, 219 MB for wholebody-133 — and gathering from it
    is wasted HBM traffic plus TPU-serialized gathers. Instead keep the
    top-K contributing cells per field and evaluate

        hr[f](X, Y) = min(1, sum_k w_k * g_k(X, Y))

    directly at the query points (:func:`eval_cells`): dense (Q, K) vector
    math that fuses into the consumer. Returns (cells dict with x, y,
    sigma, w each (F, n_cells) — w pre-scaled by 1/neighbors*factor —,
    hr_h, hr_w, overflow).
    """
    _, _, h, w = cif.shape
    hr_h = (h - 1) * stride + 1
    hr_w = (w - 1) * stride + 1
    x, y, sigma, wgt, overflow = select_cells(
        cif, stride, threshold=threshold, min_scale=min_scale,
        n_cells=n_cells)
    cells = {'x': x, 'y': y, 'sigma': sigma, 'w': wgt / neighbors * factor}
    return cells, hr_h, hr_w, overflow


def eval_cells(cells, xq, yq, *, hs, ws, default=-1.0):
    """Evaluate the lazy CifHr at query points with the rounded-pixel
    semantics of :func:`cifhr_lookup` (``cif_seeds.cpp:17-30``).

    cells: dict of (..., K) arrays; xq, yq: (..., Q) hi-res float
    coordinates broadcasting against the leading cell axes. Returns
    (..., Q) values; out-of-bounds queries return ``default``.
    Matches ``accumulate_dense`` + ``cifhr_lookup`` up to float summation
    order (same approx_exp, truncation, closest-pixel and min(sum, 1)
    clamp evaluated at the query's rounded integer pixel).
    """
    max_x = ws - 0.51
    max_y = hs - 0.51
    inb = (xq >= -0.49) & (yq >= -0.49) & (xq <= max_x) & (yq <= max_y)
    xi = jnp.clip(jnp.floor(xq + 0.5), 0, ws - 1)
    yi = jnp.clip(jnp.floor(yq + 0.5), 0, hs - 1)

    cx = cells['x'][..., None, :]        # (..., 1, K)
    cy = cells['y'][..., None, :]
    cs = cells['sigma'][..., None, :]
    cw = cells['w'][..., None, :]
    dx2 = (xi[..., :, None] - cx) ** 2   # (..., Q, K)
    dy2 = (yi[..., :, None] - cy) ** 2
    d2 = dx2 + dy2
    s2 = cs * cs
    inside = d2 <= s2
    closest = (dx2 < 0.25) & (dy2 < 0.25)
    g = jnp.where(closest, 1.0, approx_exp(-0.5 * d2 / s2))
    val = jnp.minimum(jnp.sum(jnp.where(inside, cw * g, 0.0), axis=-1), 1.0)
    return jnp.where(inb, val, default)


def cifhr_lookup(hr, f, x, y, default=-1.0):
    """Point lookup with reference rounding/bounds (``cif_seeds.cpp:17-30``).

    hr: (F, HS, WS); f, x, y broadcastable int/float arrays.
    """
    hs, ws = hr.shape[-2], hr.shape[-1]
    max_x = ws - 0.51
    max_y = hs - 0.51
    inb = (x >= -0.49) & (y >= -0.49) & (x <= max_x) & (y <= max_y)
    xi = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, ws - 1)
    yi = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, hs - 1)
    value = hr[f, yi, xi]
    return jnp.where(inb, value, default)
