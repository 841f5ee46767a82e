"""CifHr accumulation: clamped-sum == the reference's per-splat clamp.

The reference updates each pixel sequentially per splat:
``entry = min(max(entry, rev) + vv, rev + 1)`` (``cif_hr.cpp:84-86``).
For non-negative contributions that recurrence is algebraically the
clamped sum ``min(sum vv, 1)``: once the clamp binds it stays bound
(``min(min(a+b,1)+c,1) == min(a+b+c,1)`` for ``c >= 0``), so the repo's
order-independent formulation (``ops/cifhr.py``) is exact, not an
approximation. This test pins that equivalence against a literal
sequential numpy mimic of the C++ loop (same scan order, same float32
steps, same per-splat clamps, same bounding boxes) on contested scenes
— the worst case for overlapping accumulation.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))


def _sequential_reference_cifhr(cif, stride, threshold=0.3, min_scale=0.0,
                                neighbors=16, factor=1.0):
    """Literal mimic of ``CifHr::accumulate`` + ``add_gauss``
    (``cif_hr.cpp:28-89``): sequential scan order, float32 arithmetic,
    per-splat ``min(max(entry, 0) + vv, 1)`` clamps."""
    n_f, _, h, w = cif.shape
    hs, ws = (h - 1) * stride + 1, (w - 1) * stride + 1
    acc = np.zeros((n_f, hs, ws), np.float32)

    def approx_exp(x):
        if x > 2.0 or x < -2.0:
            return np.float32(0.0)
        x = np.float32(1.0) + np.float32(x) / np.float32(8.0)
        x *= x
        x *= x
        x *= x
        return x

    for f in range(n_f):
        for j in range(h):
            for i in range(w):
                v = cif[f, 1, j, i]
                if v < threshold:
                    continue
                s = cif[f, 4, j, i]
                if s < min_scale / stride:
                    continue
                x = cif[f, 2, j, i] * stride
                y = cif[f, 3, j, i] * stride
                sigma = max(1.0, 0.5 * s * stride)
                vv0 = np.float32(v / neighbors * factor)
                minx = min(max(int(x - sigma), 0), ws - 1)
                miny = min(max(int(y - sigma), 0), hs - 1)
                maxx = min(max(int(x + sigma + 1), minx + 1), ws)
                maxy = min(max(int(y + sigma + 1), miny + 1), hs)
                s2 = np.float32(sigma * sigma)
                for xx in range(minx, maxx):
                    dx2 = np.float32((xx - x) * (xx - x))
                    for yy in range(miny, maxy):
                        dy2 = np.float32((yy - y) * (yy - y))
                        if dx2 + dy2 > s2:
                            continue
                        if dx2 < 0.25 and dy2 < 0.25:
                            vv = vv0
                        else:
                            vv = vv0 * approx_exp(
                                np.float32(-0.5) * (dx2 + dy2) / s2)
                        e = max(acc[f, yy, xx], np.float32(0.0)) + vv
                        acc[f, yy, xx] = min(e, np.float32(1.0))
    return acc


@pytest.mark.parametrize('seed', [0, 1, 3, 7])
def test_clamped_sum_matches_sequential_per_splat_clamp(seed):
    import jax.numpy as jnp
    import exp_adversarial_parity as adv
    from openpifpaf_tpu.ops import cifhr as cifhr_mod

    stride = 8
    cif, _, _ = adv.overlapping_scene(seed)
    ref = _sequential_reference_cifhr(cif, stride)
    ours = np.asarray(cifhr_mod.cif_hr(jnp.asarray(cif), stride,
                                       impl='dense', n_cells=1024))
    # equality up to float32 summation order only
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_lazy_eval_matches_sequential_at_query_points():
    """The lazy splat-cell evaluation (the production path) agrees with
    the sequential reference at arbitrary query pixels."""
    import jax.numpy as jnp
    import exp_adversarial_parity as adv
    from openpifpaf_tpu.ops import cifhr as cifhr_mod

    stride = 8
    cif, _, _ = adv.overlapping_scene(2)
    ref = _sequential_reference_cifhr(cif, stride)

    cells, hs, ws, _ = cifhr_mod.cif_hr_cells(jnp.asarray(cif), stride,
                                              n_cells=1024)
    rng = np.random.RandomState(0)
    n_f = cif.shape[0]
    xq = rng.uniform(0, ws - 1, size=(n_f, 64)).astype(np.float32)
    yq = rng.uniform(0, hs - 1, size=(n_f, 64)).astype(np.float32)
    got = np.asarray(cifhr_mod.eval_cells(
        cells, jnp.asarray(xq), jnp.asarray(yq), hs=hs, ws=ws))
    xi = np.clip(np.floor(xq + 0.5).astype(int), 0, ws - 1)
    yi = np.clip(np.floor(yq + 0.5).astype(int), 0, hs - 1)
    want = ref[np.arange(n_f)[:, None], yi, xi]
    np.testing.assert_allclose(got, want, atol=2e-6)
