"""Contested-scene parity vs the reference C++ decoder at wholebody-133.

The 133-keypoint wholebody configuration is the reference's largest
field layout (`plugins/wholebody/constants.py`) and the stress case
for this decoder's static budgets (seed compaction, CAF planes,
adjacency width of the denser skeleton). The COCO-17 adversarial suite
(`test_adversarial_parity.py`) does not exercise any of that scaling,
so this pins the same tie-free pose-for-pose parity on overlapping
wholebody people through the product path (fast tier + crowd
escalation).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import field_fixtures  # noqa: E402

from test_reference_parity import _load_reference_decoder  # noqa: E402

STRIDE = 8


@pytest.fixture(scope='module')
def setup():
    torch = _load_reference_decoder()
    import openpifpaf_tpu
    from openpifpaf_tpu.decoder.cifcaf import CifCaf

    wb = openpifpaf_tpu.datasets.factory('wholebody')
    cif_meta, caf_meta = wb.head_metas
    for i, m in enumerate((cif_meta, caf_meta)):
        m.base_stride = STRIDE
        m.head_index = i
    skeleton = np.asarray(caf_meta.skeleton, dtype=np.int64)
    ref = torch.classes.openpifpaf_decoder.CifCaf(
        len(cif_meta.keypoints), torch.from_numpy(skeleton) - 1)
    cifcaf = CifCaf(cif_meta, caf_meta)
    return torch, ref, cifcaf, (cif_meta, caf_meta)


def _scene(metas, seed, hw=(137, 177)):
    cif_meta, _ = metas
    rng = np.random.RandomState(seed)
    n_people = int(rng.randint(2, 4))
    cx0 = rng.uniform(60, hw[1] - 60)
    cy0 = rng.uniform(65, hw[0] - 65)
    anns = []
    for _ in range(n_people):
        size = rng.uniform(70.0, 110.0)
        dx = rng.uniform(-0.5, 0.5) * size * 0.5
        dy = rng.uniform(-0.5, 0.5) * size * 0.5
        kps = field_fixtures.synthetic_person(
            np.clip(cx0 + dx, 50, hw[1] - 50),
            np.clip(cy0 + dy, 55, hw[0] - 55),
            size, rng, pose=cif_meta.pose)
        anns.append(field_fixtures.annotation_dict(kps))
    cif, caf, _ = field_fixtures.fields_from_annotations(
        anns, hw, stride=STRIDE, metas=metas)
    # tie-free confidences (reference tie order is unstable-sort-defined)
    jr = np.random.RandomState(1000 + seed)
    cif[:, 1] *= (1.0 + jr.uniform(-0.01, 0.01, size=cif[:, 1].shape)
                  ).astype(np.float32)
    caf[:, 1] *= (1.0 + jr.uniform(-0.01, 0.01, size=caf[:, 1].shape)
                  ).astype(np.float32)
    return cif, caf, n_people


@pytest.mark.parametrize('seed', [0, 1])
def test_wholebody_contested_parity(setup, seed):
    torch, ref, cifcaf, metas = setup
    cif, caf, _ = _scene(metas, seed)

    ref_anns, _ = ref.call(torch.from_numpy(cif), STRIDE,
                           torch.from_numpy(caf), STRIDE)
    ref_poses = list(ref_anns.numpy())

    poses, keep, _ = cifcaf._decode_adaptive(STRIDE, (cif[None], caf[None]))
    our_poses = list(np.asarray(poses)[0][np.asarray(keep)[0] > 0])

    assert len(our_poses) == len(ref_poses) >= 2
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
        np.testing.assert_allclose(op[vis_o, 0], rp[vis_o, 0], atol=5e-3)
