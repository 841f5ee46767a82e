"""Adversarial decode parity vs the reference C++ decoder.

Contested scenes — 2-5 people whose torsos overlap, shared seed
neighborhoods, joints within one sigma of each other — are exactly
where this repo's parallel-growth decode could silently diverge from
the reference's sequential occupancy-gated growth
(``csrc/src/cifcaf.cpp:204-313``). These tests run randomized
overlapping scenes through both decoders via the product path (fast
tier + certificate-driven crowd escalation,
``decoder/cifcaf.py::_decode_adaptive``).

Two regimes, asserted separately:

- **Tie-free scenes** (per-cell confidence jitter): with the
  seed-rank dedup (``ops/seeds.py::seed_rank_dedup``) reproducing the
  reference's sequential seed gate exactly, decodes are
  **pose-for-pose identical** — same counts, same visibility
  patterns, confidences within 2e-3, locations within 1e-3 px
  (``test_tiefree_scene_exact_parity``).
- **Raw synthetic scenes** contain *bit-equal* seed scores (encoder
  targets are piecewise-constant), and the reference orders those
  with an unstable ``std::sort`` (``cif_seeds.cpp:93-97``) — its own
  tie order is implementation-defined. Both decoders then grow the
  same person from different (equally-scored) seeds; locations agree
  but joint confidences inherit different sqrt-chain provenances
  (deltas to ~0.12). The loose-tolerance test pins that envelope
  (``test_contested_scene_parity``).

CifHr accumulation itself is exact (see ``test_cifhr_exactness.py``)
— the per-splat clamp recurrence equals the clamped sum for
non-negative splats, so none of the above comes from accumulation.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

from test_reference_parity import _load_reference_decoder  # noqa: E402

STRIDE = 8
SEEDS = list(range(10))


@pytest.fixture(scope='module')
def setup():
    torch = _load_reference_decoder()
    import exp_adversarial_parity as adv
    import openpifpaf_tpu
    from openpifpaf_tpu.decoder.cifcaf import CifCaf

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    skeleton = np.asarray(caf_meta.skeleton, dtype=np.int64)
    ref = torch.classes.openpifpaf_decoder.CifCaf(
        17, torch.from_numpy(skeleton) - 1)
    cifcaf = CifCaf(cif_meta, caf_meta)
    return torch, adv, ref, cifcaf


@pytest.mark.parametrize('seed', SEEDS)
def test_contested_scene_parity(setup, seed):
    torch, adv, ref, cifcaf = setup
    cif, caf, n_people = adv.overlapping_scene(seed)

    ref_anns, _ = ref.call(torch.from_numpy(cif), STRIDE,
                           torch.from_numpy(caf), STRIDE)
    ref_poses = list(ref_anns.numpy())

    poses, keep, _ = cifcaf._decode_adaptive(STRIDE, (cif[None], caf[None]))
    our_poses = list(np.asarray(poses)[0][np.asarray(keep)[0] > 0])

    # the reference may emit one extra fragment; never the other way,
    # and never more than one
    assert len(ref_poses) - 1 <= len(our_poses) <= len(ref_poses)

    # every pose we emit must be a reference pose: exact visibility
    # pattern, sub-pixel locations, close confidences
    used = set()
    for op in our_poses:
        vis_o = op[:, 0] > 0
        best, best_d = None, None
        for i, rp in enumerate(ref_poses):
            if i in used:
                continue
            vis = vis_o & (rp[:, 0] > 0)
            if not np.any(vis):
                continue
            d = float(np.linalg.norm(rp[vis, 1:3] - op[vis, 1:3],
                                     axis=1).mean())
            if best_d is None or d < best_d:
                best, best_d = i, d
        assert best is not None, 'emitted pose matches no reference pose'
        used.add(best)
        rp = ref_poses[best]
        np.testing.assert_array_equal(vis_o, rp[:, 0] > 0)
        np.testing.assert_allclose(op[vis_o, 1:3], rp[vis_o, 1:3],
                                   atol=0.75)
        # confidences: raw synthetic scenes contain bit-equal seed
        # scores whose order the reference's unstable std::sort leaves
        # implementation-defined; growing from a different equally-
        # scored seed changes every joint's sqrt-chain provenance.
        # Measured max delta over the 10 scenes: 0.115 (locations are
        # unaffected: sub-1e-5 px). Tie-free scenes are exact — see
        # test_tiefree_scene_exact_parity.
        np.testing.assert_allclose(op[vis_o, 0], rp[vis_o, 0], atol=0.2)

    if len(our_poses) < len(ref_poses):
        # the unmatched reference pose must be the fragment case: a
        # partial pose, and the lowest-confidence one in the scene
        (missed,) = set(range(len(ref_poses))) - used
        mp = ref_poses[missed]
        vis = mp[:, 0] > 0
        assert vis.sum() < 17
        mean_conf = mp[vis, 0].mean()
        for i, rp in enumerate(ref_poses):
            if i == missed:
                continue
            rvis = rp[:, 0] > 0
            assert rp[rvis, 0].mean() >= mean_conf


@pytest.mark.parametrize('seed', SEEDS)
def test_tiefree_scene_exact_parity(setup, seed):
    """With bit-equal seed-score ties broken by per-cell jitter, the
    seed-rank dedup makes decodes pose-for-pose identical to the
    reference: same counts, same visibility, near-equal confidences."""
    torch, adv, ref, cifcaf = setup
    cif, caf, _ = adv.overlapping_scene(seed)
    jr = np.random.RandomState(1000 + seed)
    cif = cif.copy()
    caf = caf.copy()
    cif[:, 1] *= (1.0 + jr.uniform(-0.01, 0.01, size=cif[:, 1].shape)
                  ).astype(np.float32)
    caf[:, 1] *= (1.0 + jr.uniform(-0.01, 0.01, size=caf[:, 1].shape)
                  ).astype(np.float32)

    ref_anns, _ = ref.call(torch.from_numpy(cif), STRIDE,
                           torch.from_numpy(caf), STRIDE)
    ref_poses = list(ref_anns.numpy())

    poses, keep, _ = cifcaf._decode_adaptive(STRIDE, (cif[None], caf[None]))
    our_poses = list(np.asarray(poses)[0][np.asarray(keep)[0] > 0])

    assert len(our_poses) == len(ref_poses)
    used = set()
    for op in our_poses:
        vis_o = op[:, 0] > 0
        best, best_d = None, None
        for i, rp in enumerate(ref_poses):
            if i in used:
                continue
            vis = vis_o & (rp[:, 0] > 0)
            if not np.any(vis):
                continue
            d = float(np.linalg.norm(rp[vis, 1:3] - op[vis, 1:3],
                                     axis=1).mean())
            if best_d is None or d < best_d:
                best, best_d = i, d
        assert best is not None
        used.add(best)
        rp = ref_poses[best]
        np.testing.assert_array_equal(vis_o, rp[:, 0] > 0)
        np.testing.assert_allclose(op[vis_o, 1:3], rp[vis_o, 1:3],
                                   atol=1e-3)
        np.testing.assert_allclose(op[vis_o, 0], rp[vis_o, 0], atol=2e-3)
