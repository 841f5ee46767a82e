"""Pallas CifHr kernel parity in CI (interpret mode on CPU).

The production decode path auto-selects the Pallas tiled kernel on TPU
(``ops/cifhr.py::cif_hr`` impl='auto'), but CI runs on CPU where the dense
jnp path is taken — so without these tests a broken kernel would only
surface as silently wrong TPU results. Every case runs the real kernel
through the Pallas interpreter and asserts parity with the dense
reference implementation (semantics: csrc/src/cif_hr.cpp:28-121, incl.
the 8-term approx_exp at 18-25).

The kernel compacts cells per (field, tile); with ``k_tile=n_cells``
(what the decoder's crowd tier uses) it is exact for any input, and with
the default budget it is exact unless the overflow flag fires — both
contracts are asserted here.

bench.py additionally asserts pallas-vs-dense parity once on the real
device before timing.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openpifpaf_tpu.ops.cifhr import accumulate_dense
from openpifpaf_tpu.ops.cifhr_pallas import (
    _SMEM_BUDGET, _smem_bytes_per_field, accumulate_pallas)


def random_cells(n_fields, n_cells, hr_h, hr_w, seed=0, dead_fraction=0.4):
    """Realistic cell parameters: positions inside (and slightly outside)
    the map, sigmas 1..18, a fraction of dead padding cells (w == 0) like
    the static top-K budget produces."""
    rng = np.random.RandomState(seed)
    x = rng.uniform(-10.0, hr_w + 10.0, (n_fields, n_cells)).astype(np.float32)
    y = rng.uniform(-10.0, hr_h + 10.0, (n_fields, n_cells)).astype(np.float32)
    sigma = rng.uniform(1.0, 18.0, (n_fields, n_cells)).astype(np.float32)
    w = rng.uniform(0.3, 1.0, (n_fields, n_cells)).astype(np.float32)
    w[rng.rand(n_fields, n_cells) < dead_fraction] = 0.0
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(sigma), jnp.asarray(w)


def assert_parity(x, y, sigma, w, hr_h, hr_w, *, k_tile='exact', **kwargs):
    if k_tile == 'exact':
        k_tile = x.shape[1]
    dense = accumulate_dense(x, y, sigma, w, hr_h=hr_h, hr_w=hr_w, **kwargs)
    pallas, overflow = accumulate_pallas(
        x, y, sigma, w, hr_h=hr_h, hr_w=hr_w, interpret=True,
        k_tile=k_tile, return_overflow=True, **kwargs)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(dense),
                               atol=1e-6, rtol=1e-6)
    return np.asarray(dense)


def test_coco17_shape_parity():
    """COCO-17 at a 641px-class map, default 256-cell budget, exact
    tiles (crowd-tier contract: k_tile == n_cells can never overflow)."""
    hr_h, hr_w = 161, 209  # keeps interpret-mode runtime reasonable
    cells = random_cells(17, 256, hr_h, hr_w, seed=1)
    dense = assert_parity(*cells, hr_h, hr_w)
    assert dense.max() > 0.1  # the scene actually splats something


def test_default_k_tile_parity_when_not_overflowing():
    """With the default per-tile budget and a sparse scene the overflow
    flag stays False and the result is exact."""
    hr_h, hr_w = 161, 209
    cells = random_cells(17, 256, hr_h, hr_w, seed=6, dead_fraction=0.95)
    assert_parity(*cells, hr_h, hr_w, k_tile=None)


def test_tile_overflow_flag_and_underestimate():
    """More intersecting cells than k_tile: the flag fires (driving the
    decoder's crowd-tier escalation) and the map only underestimates."""
    hr_h, hr_w = 65, 81
    n = 48
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.uniform(20, 60, (1, n)).astype(np.float32))
    y = jnp.asarray(rng.uniform(20, 44, (1, n)).astype(np.float32))
    sigma = jnp.full((1, n), 3.0)
    w = jnp.full((1, n), 0.5)
    dense = accumulate_dense(x, y, sigma, w, hr_h=hr_h, hr_w=hr_w)
    pallas, overflow = accumulate_pallas(
        x, y, sigma, w, hr_h=hr_h, hr_w=hr_w, interpret=True,
        k_tile=8, return_overflow=True)
    assert bool(overflow)
    assert np.all(np.asarray(pallas) <= np.asarray(dense) + 1e-6)


def test_wholebody133_field_chunking_parity():
    """133 fields x 1024 cells exceeds the SMEM budget in one launch, so
    accumulate_pallas must chunk the fields axis (cifhr_pallas.py
    field-group chunking) — assert the chunked result still matches."""
    n_fields, n_cells = 133, 1024
    hr_h, hr_w = 81, 105
    assert n_fields * _smem_bytes_per_field(n_cells, 1, 256) \
        > _SMEM_BUDGET  # does chunk
    cells = random_cells(n_fields, n_cells, hr_h, hr_w, seed=2,
                         dead_fraction=0.9)
    assert_parity(*cells, hr_h, hr_w)


def test_cell_count_padding_parity():
    """n_cells not a multiple of the compaction chunk exercises the
    k_tile round-up."""
    hr_h, hr_w = 65, 81
    cells = random_cells(5, 37, hr_h, hr_w, seed=3)
    assert_parity(*cells, hr_h, hr_w)


def test_all_dead_cells():
    """All-zero weights (empty image): output must be exactly zero."""
    hr_h, hr_w = 65, 81
    x, y, sigma, w = random_cells(17, 64, hr_h, hr_w, seed=4)
    w = jnp.zeros_like(w)
    out = accumulate_pallas(x, y, sigma, w, hr_h=hr_h, hr_w=hr_w,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_neighbors_factor_scaling():
    """neighbors/factor scale the splat amplitude identically."""
    hr_h, hr_w = 65, 81
    cells = random_cells(3, 32, hr_h, hr_w, seed=5)
    assert_parity(*cells, hr_h, hr_w, neighbors=8, factor=0.5)


def test_clamp_at_one():
    """Many overlapping high-weight splats saturate at the min(sum, 1)
    clamp in both implementations."""
    hr_h, hr_w = 65, 81
    n = 48
    x = jnp.full((1, n), 40.0)
    y = jnp.full((1, n), 32.0)
    sigma = jnp.full((1, n), 12.0)
    w = jnp.full((1, n), 1.0)
    dense = assert_parity(x, y, sigma, w, hr_h, hr_w, neighbors=1)
    assert dense.max() == 1.0


@pytest.mark.parametrize('batch,expect_map', [(2, False), (48, True)])
def test_vmap_rule_parity(batch, expect_map):
    """The custom vmap rule folds small batches into the fields axis and
    falls back to lax.map above the SMEM budget; both must match a loop
    of single calls."""
    import jax

    hr_h, hr_w = 49, 65
    n_fields, n_cells = 17, 64
    smem = batch * n_fields * _smem_bytes_per_field(n_cells, 1, 64)
    assert (smem > _SMEM_BUDGET) == expect_map

    rng_cells = [random_cells(n_fields, n_cells, hr_h, hr_w, seed=10 + b)
                 for b in range(batch)]
    xb, yb, sb, wb = (jnp.stack([c[i] for c in rng_cells])
                      for i in range(4))

    batched = jax.vmap(
        lambda x, y, s, w: accumulate_pallas(
            x, y, s, w, hr_h=hr_h, hr_w=hr_w, interpret=True))(xb, yb, sb, wb)
    for b in (0, batch - 1):
        single = accumulate_dense(xb[b], yb[b], sb[b], wb[b],
                                  hr_h=hr_h, hr_w=hr_w)
        np.testing.assert_allclose(np.asarray(batched[b]),
                                   np.asarray(single), atol=1e-6, rtol=1e-6)
