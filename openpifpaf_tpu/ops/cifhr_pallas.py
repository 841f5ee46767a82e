"""Pallas TPU kernel for CifHr accumulation.

Gather formulation: the hi-res map is tiled over a (fields, tile_rows,
tile_cols) grid; each program evaluates all K candidate cells of its field
against its tile and accumulates truncated Gaussians in VMEM. Per-cell
culling (bbox-vs-tile intersection) skips the vector work for cells that
cannot touch the tile, which is the common case since most splats have
sigma of only a few pixels.

This replaces the sequential CPU scatter of the reference
(``csrc/src/cif_hr.cpp:58-89``) with a fully parallel, fixed-shape device
kernel; the clamped accumulation is order-independent (min(sum, 1)).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_CHUNK = 16
#: cell parameters (x, y, sigma, w as f32) live in SMEM (1 MB hardware
#: budget); both the field-group chunking in :func:`accumulate_pallas`
#: and the vmap rule's per-element fallback size against these
_SMEM_BUDGET = 512 * 1024
_BYTES_PER_CELL = 4 * 4


def _kernel(active_ref, x_ref, y_ref, sig_ref, w_ref, out_ref, *,
            n_cells, tile_h, tile_w):
    f = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    base = f * n_cells
    n_chunks = n_cells // _CHUNK
    y0 = (i * tile_h).astype(jnp.float32)
    x0 = (j * tile_w).astype(jnp.float32)

    ys = y0 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    xs = x0 + jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)

    def cell_body(k, acc):
        cx = x_ref[base + k]
        cy = y_ref[base + k]
        cs = sig_ref[base + k]
        cw = w_ref[base + k]

        intersects = ((cw > 0.0)
                      & (cx + cs >= x0) & (cx - cs <= x0 + tile_w - 1)
                      & (cy + cs >= y0) & (cy - cs <= y0 + tile_h - 1))

        def add(acc):
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

        return jax.lax.cond(intersects, add, lambda a: a, acc)

    # the per-cell cull loop runs on the scalar core, so trip count is the
    # cost; most of the static top-K budget is dead padding (w == 0), so
    # dead 16-cell chunks — flagged outside the kernel — cost one branch.
    # All loop bounds stay static (dynamic trip counts hang Mosaic here).
    def chunk_body(c, acc):
        def run(acc):
            return jax.lax.fori_loop(
                c * _CHUNK, (c + 1) * _CHUNK, cell_body, acc)
        return jax.lax.cond(
            active_ref[f * n_chunks + c] != 0, run, lambda a: a, acc)

    acc = jax.lax.fori_loop(0, n_chunks, chunk_body,
                            jnp.zeros((tile_h, tile_w), jnp.float32))
    out_ref[0] = jnp.minimum(acc, 1.0)


@functools.lru_cache(maxsize=32)
def _build_call(hr_h, hr_w, tile_h, tile_w, interpret=False):
    """pallas_call wrapped with a custom vmap rule that folds a batch axis
    into the (independent) fields axis, keeping the SMEM parameter arrays
    flat — direct vmap of the call would produce blocked SMEM layouts the
    TPU lowering rejects."""

    @jax.custom_batching.custom_vmap
    def call(x, y, sigma, weight):
        n_fields, n_cells = x.shape
        if n_cells % _CHUNK:
            pad = _CHUNK - n_cells % _CHUNK
            x, y, sigma, weight = (
                jnp.pad(a, ((0, 0), (0, pad))) for a in (x, y, sigma, weight))
            n_cells += pad
        grid = (n_fields, pl.cdiv(hr_h, tile_h), pl.cdiv(hr_w, tile_w))
        # per-chunk activity flags: a chunk with no w > 0 cell is skipped
        # by the kernel with a single scalar branch
        active = jnp.any(
            (weight > 0.0).reshape(n_fields, n_cells // _CHUNK, _CHUNK),
            axis=2).astype(jnp.int32)
        # full (unblocked) flat parameter arrays in SMEM: avoids
        # blocked-layout constraints; the kernel indexes by field via
        # program_id(0)
        cell_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.pallas_call(
            functools.partial(_kernel, n_cells=n_cells,
                              tile_h=tile_h, tile_w=tile_w),
            out_shape=jax.ShapeDtypeStruct((n_fields, hr_h, hr_w),
                                           jnp.float32),
            grid=grid,
            in_specs=[cell_spec, cell_spec, cell_spec, cell_spec,
                      cell_spec],
            out_specs=pl.BlockSpec((1, tile_h, tile_w),
                                   lambda f, i, j: (f, i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(active.reshape(-1), x.reshape(-1), y.reshape(-1),
          sigma.reshape(-1), weight.reshape(-1))

    @call.def_vmap
    def _call_vmap(axis_size, in_batched, x, y, sigma, weight):
        def bat(v, batched):
            if not batched:
                return jnp.broadcast_to(v[None], (axis_size,) + v.shape)
            return v

        args = [bat(v, b) for v, b in
                zip((x, y, sigma, weight), in_batched)]
        n_fields = args[0].shape[1]
        n_cells = args[0].shape[2]
        # the kernel's cell parameters live in SMEM (~1 MB): folding the
        # batch into the fields axis multiplies their footprint, so large
        # batches run the kernel per element instead (decode is serial on
        # one core either way)
        smem_bytes = axis_size * n_fields * n_cells * _BYTES_PER_CELL
        if smem_bytes > _SMEM_BUDGET:
            out = jax.lax.map(lambda a: call(*a), tuple(args))
            return out, True
        flat = [a.reshape(axis_size * n_fields, -1) for a in args]
        out = call(*flat)
        return out.reshape(axis_size, n_fields, hr_h, hr_w), True

    return call


def accumulate_pallas(x, y, sigma, w, *, hr_h, hr_w, neighbors=16, factor=1.0,
                      tile_h=128, tile_w=256, interpret=False):
    """Pallas CifHr accumulation. Same contract as
    :func:`cifhr.accumulate_dense`.

    The 128x256 default tile won a measured sweep at 641px on v5e
    (32x128: 14ms, 64x128: 5.3ms, 128x256: 2.5ms, 256x256: 3.5ms,
    full plane: 11ms): small tiles are bound by the per-cell cull loop
    on the scalar core, large tiles by wasted vector accumulation.

    ``interpret=True`` runs the kernel through the Pallas interpreter
    (works on CPU; used by tests/test_cifhr_pallas.py for CI parity).
    """
    weight = w / neighbors * factor
    call = _build_call(hr_h, hr_w, tile_h, tile_w, interpret)

    # the cell parameters live in SMEM (~1 MB): chunk the fields axis so
    # each kernel launch stays within budget (133-field wholebody at 1024
    # cells would need 2.2 MB in one launch)
    n_fields, n_cells = x.shape
    per_call = max(1, _SMEM_BUDGET // (_BYTES_PER_CELL * max(n_cells, 1)))
    if n_fields <= per_call:
        return call(x, y, sigma, weight)
    outs = [call(x[s:s + per_call], y[s:s + per_call],
                 sigma[s:s + per_call], weight[s:s + per_call])
            for s in range(0, n_fields, per_call)]
    return jnp.concatenate(outs, axis=0)
