"""Pallas TPU kernel for CifHr accumulation.

Gather formulation with per-tile cell compaction: the hi-res map is tiled
over a (fields, tile_rows, tile_cols) grid. For every (field, tile) pair,
a vectorized XLA pass outside the kernel compacts the top-K_tile cells
whose truncated-Gaussian bbox intersects the tile; the kernel then loops
over exactly those cells. This keeps the per-tile scalar-core loop
proportional to the cells that actually touch the tile (a splat has sigma
of a few pixels, so each cell hits ~1-2 tiles), instead of scanning the
full static top-K cell budget per tile — the scalar cull loop of the
previous kernel version was the decode bottleneck (~60% of CifHr time at
641px).

This replaces the sequential CPU scatter of the reference
(``csrc/src/cif_hr.cpp:58-89``) with a fully parallel, fixed-shape device
kernel; the clamped accumulation is order-independent (min(sum, 1)).

If a tile intersects more than K_tile cells the result may underestimate;
``return_overflow=True`` reports this so the decoder's two-tier escalation
re-runs the image through the crowd config (where K_tile == n_cells, i.e.
no compaction and no possible overflow).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_CHUNK = 8
#: per-field SMEM footprint must stay inside the 1 MB hardware budget;
#: both the field-group chunking in :func:`accumulate_pallas` and the
#: vmap rule's per-element fallback size against this
_SMEM_BUDGET = 512 * 1024
_BYTES_PER_CELL = 4 * 4


def default_k_tile(n_cells):
    """Per-tile cell budget: a quarter of the field budget (cells spread
    over ~12 tiles at 641px), floor 64. The decoder's crowd tier passes
    k_tile=n_cells explicitly for exactness."""
    return min(n_cells, max(64, n_cells // 4))


def _smem_bytes_per_field(n_cells, n_tiles, k_tile):
    return (n_cells * _BYTES_PER_CELL   # x, y, sigma, w
            + n_tiles * k_tile * 4      # compacted cell indices
            + n_tiles * 4)              # per-tile counts


def _kernel(counts_ref, idx_ref, x_ref, y_ref, sig_ref, w_ref, out_ref, *,
            n_cells, k_tile, n_tiles, n_tj, tile_h, tile_w):
    f = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    t = i * n_tj + j
    base = f * n_cells
    ibase = (f * n_tiles + t) * k_tile
    n = counts_ref[f * n_tiles + t]
    y0 = (i * tile_h).astype(jnp.float32)
    x0 = (j * tile_w).astype(jnp.float32)

    ys = y0 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    xs = x0 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)

    def cell_body(k, acc):
        def add(acc):
            cell = idx_ref[ibase + k]
            cx = x_ref[base + cell]
            cy = y_ref[base + cell]
            cs = sig_ref[base + cell]
            cw = w_ref[base + cell]
            dx2 = (xs - cx) ** 2
            dy2 = (ys - cy) ** 2
            d2 = dx2 + dy2
            s2 = cs * cs
            inside = d2 <= s2
            closest = (dx2 < 0.25) & (dy2 < 0.25)
            # approx_exp from cif_hr.cpp:18-25; argument is in [-0.5, 0]
            # inside the truncation radius, so no range cutoff needed
            e = 1.0 + (-0.5 * d2 / s2) / 8.0
            e = e * e
            e = e * e
            e = e * e
            g = jnp.where(closest, 1.0, e)
            return acc + jnp.where(inside, cw * g, 0.0)

        return jax.lax.cond(k < n, add, lambda a: a, acc)

    # every listed cell intersects this tile by construction; the scalar
    # loop runs only to the tile's cell count (in _CHUNK granularity).
    # All loop bounds stay static (dynamic trip counts hang Mosaic here).
    def chunk_body(c, acc):
        def run(acc):
            return jax.lax.fori_loop(
                c * _CHUNK, (c + 1) * _CHUNK, cell_body, acc)
        return jax.lax.cond(c * _CHUNK < n, run, lambda a: a, acc)

    acc = jax.lax.fori_loop(0, k_tile // _CHUNK, chunk_body,
                            jnp.zeros((tile_h, tile_w), jnp.float32))
    out_ref[0] = jnp.minimum(acc, 1.0)


def _compact_cells(x, y, sigma, weight, *, hr_h, hr_w, tile_h, tile_w,
                   k_tile):
    """Per-(field, tile) compaction of intersecting cells.

    Returns (idx (F, T, k_tile) int32 cell indices, counts (F, T) int32,
    overflow bool scalar). Vectorized XLA; the kernel consumes idx/counts
    from SMEM.
    """
    n_ti = pl.cdiv(hr_h, tile_h)
    n_tj = pl.cdiv(hr_w, tile_w)
    ti = jnp.arange(n_ti, dtype=jnp.float32) * tile_h  # tile y origins
    tj = jnp.arange(n_tj, dtype=jnp.float32) * tile_w
    y0 = jnp.repeat(ti, n_tj)   # (T,)
    x0 = jnp.tile(tj, n_ti)

    # (F, T, K) bbox-vs-tile intersection
    xx = x[:, None, :]
    yy = y[:, None, :]
    ss = sigma[:, None, :]
    ww = weight[:, None, :]
    x0b = x0[None, :, None]
    y0b = y0[None, :, None]
    intersects = ((ww > 0.0)
                  & (xx + ss >= x0b) & (xx - ss <= x0b + tile_w - 1)
                  & (yy + ss >= y0b) & (yy - ss <= y0b + tile_h - 1))

    counts = jnp.sum(intersects, axis=-1).astype(jnp.int32)  # (F, T)
    overflow = jnp.any(counts > k_tile)
    # top_k of the 0/1 mask: equal values keep ascending index order, so
    # this lists the first k_tile intersecting cell indices per tile.
    # k_tile is chunk-rounded and may exceed the cell count; pad (padded
    # lanes are gated by the counts in the kernel).
    k_sel = min(k_tile, intersects.shape[-1])
    _, idx = jax.lax.top_k(intersects.astype(jnp.int32), k_sel)
    if k_sel < k_tile:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, k_tile - k_sel)))
    return idx.astype(jnp.int32), jnp.minimum(counts, k_tile), overflow


@functools.lru_cache(maxsize=32)
def _build_call(hr_h, hr_w, tile_h, tile_w, n_cells_static, k_tile,
                interpret=False):
    """pallas_call wrapped with a custom vmap rule that folds a batch axis
    into the (independent) fields axis, keeping the SMEM parameter arrays
    flat — direct vmap of the call would produce blocked SMEM layouts the
    TPU lowering rejects."""
    n_ti = pl.cdiv(hr_h, tile_h)
    n_tj = pl.cdiv(hr_w, tile_w)
    n_tiles = n_ti * n_tj

    @jax.custom_batching.custom_vmap
    def call(counts, idx, x, y, sigma, weight):
        n_fields, n_cells = x.shape
        grid = (n_fields, n_ti, n_tj)
        # full (unblocked) flat parameter arrays in SMEM: avoids
        # blocked-layout constraints; the kernel indexes by field via
        # program_id(0)
        cell_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.pallas_call(
            functools.partial(_kernel, n_cells=n_cells, k_tile=k_tile,
                              n_tiles=n_tiles, n_tj=n_tj,
                              tile_h=tile_h, tile_w=tile_w),
            out_shape=jax.ShapeDtypeStruct((n_fields, hr_h, hr_w),
                                           jnp.float32),
            grid=grid,
            in_specs=[cell_spec] * 6,
            out_specs=pl.BlockSpec((1, tile_h, tile_w),
                                   lambda f, i, j: (f, i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(counts.reshape(-1), idx.reshape(-1), x.reshape(-1),
          y.reshape(-1), sigma.reshape(-1), weight.reshape(-1))

    @call.def_vmap
    def _call_vmap(axis_size, in_batched, counts, idx, x, y, sigma, weight):
        def bat(v, batched):
            if not batched:
                return jnp.broadcast_to(v[None], (axis_size,) + v.shape)
            return v

        args = [bat(v, b) for v, b in
                zip((counts, idx, x, y, sigma, weight), in_batched)]
        n_fields = args[2].shape[1]
        n_cells = args[2].shape[2]
        # the kernel's parameters live in SMEM (~1 MB): folding the batch
        # into the fields axis multiplies their footprint, so large
        # batches run the kernel per element instead (decode is serial on
        # one core either way)
        smem = axis_size * n_fields * _smem_bytes_per_field(
            n_cells, n_tiles, k_tile)
        if smem > _SMEM_BUDGET:
            out = jax.lax.map(lambda a: call(*a), tuple(args))
            return out, True
        flat = [a.reshape((axis_size * n_fields,) + a.shape[2:])
                for a in args]
        out = call(*flat)
        return out.reshape(axis_size, n_fields, hr_h, hr_w), True

    return call


def accumulate_pallas(x, y, sigma, w, *, hr_h, hr_w, neighbors=16,
                      factor=1.0, tile_h=128, tile_w=256, k_tile=None,
                      interpret=False, return_overflow=False):
    """Pallas CifHr accumulation. Same contract as
    :func:`cifhr.accumulate_dense`.

    The 128x256 default tile won a measured sweep at 641px on v5e
    (32x128: 14ms, 64x128: 5.3ms, 128x256: 2.5ms, 256x256: 3.5ms,
    full plane: 11ms): small tiles are bound by the per-cell loop on the
    scalar core, large tiles by wasted vector accumulation.

    k_tile bounds the cells per (field, tile); tiles with more
    intersecting cells underestimate and raise the overflow flag
    (``return_overflow=True``). Pass ``k_tile=n_cells`` for exactness
    (the decoder's crowd tier does).

    ``interpret=True`` runs the kernel through the Pallas interpreter
    (works on CPU; used by tests/test_cifhr_pallas.py for CI parity).
    """
    weight = w / neighbors * factor
    n_fields, n_cells = x.shape
    if k_tile is None:
        k_tile = default_k_tile(n_cells)
    k_tile = min(k_tile, n_cells)
    if k_tile % _CHUNK:
        k_tile += _CHUNK - k_tile % _CHUNK

    idx, counts, overflow = _compact_cells(
        x, y, sigma, weight, hr_h=hr_h, hr_w=hr_w,
        tile_h=tile_h, tile_w=tile_w, k_tile=k_tile)

    n_tiles = pl.cdiv(hr_h, tile_h) * pl.cdiv(hr_w, tile_w)
    call = _build_call(hr_h, hr_w, tile_h, tile_w, n_cells, k_tile,
                       interpret)

    # chunk the fields axis so each kernel launch stays within the SMEM
    # budget (133-field wholebody at 1024 cells would blow it in one)
    per_call = max(1, _SMEM_BUDGET // _smem_bytes_per_field(
        n_cells, n_tiles, k_tile))
    if n_fields <= per_call:
        hr = call(counts, idx, x, y, sigma, weight)
    else:
        outs = [call(counts[s:s + per_call], idx[s:s + per_call],
                     x[s:s + per_call], y[s:s + per_call],
                     sigma[s:s + per_call], weight[s:s + per_call])
                for s in range(0, n_fields, per_call)]
        hr = jnp.concatenate(outs, axis=0)
    if return_overflow:
        return hr, overflow
    return hr
