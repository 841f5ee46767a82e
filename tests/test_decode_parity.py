"""Parity tests: vectorized JAX decoder vs the sequential numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
import field_fixtures

from openpifpaf_tpu.ops import cifhr as cifhr_mod
from openpifpaf_tpu.ops import seeds as seeds_mod
from openpifpaf_tpu.ops import caf_scored as caf_scored_mod
from openpifpaf_tpu.ops import grow as grow_mod
from openpifpaf_tpu.ops import decode_cifcaf as decode_mod
from openpifpaf_tpu.plugins.coco import constants

STRIDE = 8
SKELETON = constants.COCO_PERSON_SKELETON


@pytest.fixture(scope='module')
def two_person_fields():
    rng = np.random.RandomState(42)
    anns = [
        field_fixtures.annotation_dict(
            field_fixtures.synthetic_person(40.0, 60.0, 90.0, rng)),
        field_fixtures.annotation_dict(
            field_fixtures.synthetic_person(100.0, 55.0, 70.0, rng)),
    ]
    cif, caf, metas = field_fixtures.fields_from_annotations(
        anns, (129, 161), stride=STRIDE)
    return cif, caf, metas


def test_cifhr_parity(two_person_fields):
    cif, _, _ = two_person_fields
    hr_oracle = oracle.cif_hr(cif, STRIDE)
    hr_jax = np.asarray(cifhr_mod.cif_hr(cif, STRIDE, n_cells=512))
    np.testing.assert_allclose(hr_jax, hr_oracle, atol=1e-5)


def test_seeds_parity(two_person_fields):
    cif, _, _ = two_person_fields
    hr = oracle.cif_hr(cif, STRIDE)
    seeds_o = oracle.cif_seeds(cif, hr, STRIDE)
    seeds_j = seeds_mod.cif_seeds(cif, np.asarray(hr), STRIDE, n_seeds=1024)

    n_o = len(seeds_o)
    v_j = np.asarray(seeds_j['v'])
    n_j = int(np.sum(v_j > 0))
    assert n_j == n_o

    # same scores in the same order (ties may swap, so compare sorted values)
    np.testing.assert_allclose(
        np.sort(v_j[:n_o])[::-1],
        np.asarray([s[1] for s in seeds_o]),
        atol=1e-5)


def test_caf_scored_parity(two_person_fields):
    cif, caf, _ = two_person_fields
    hr = oracle.cif_hr(cif, STRIDE)
    fwd_o, bwd_o = oracle.caf_scored(caf, hr, STRIDE, SKELETON)
    dense = caf_scored_mod.caf_scored(caf, np.asarray(hr), STRIDE,
                                      np.asarray(SKELETON))

    n_edges = caf.shape[0]
    c = np.asarray(dense['c'])
    for e in range(n_edges):
        n_fwd_j = int(np.sum(c[e] > 0))
        n_bwd_j = int(np.sum(c[e + n_edges] > 0))
        assert n_fwd_j == len(fwd_o[e])
        assert n_bwd_j == len(bwd_o[e])
        if fwd_o[e]:
            np.testing.assert_allclose(
                np.sort(c[e][c[e] > 0]),
                np.sort([cand[0] for cand in fwd_o[e]]),
                atol=1e-5)


def test_blend_parity(two_person_fields):
    cif, caf, _ = two_person_fields
    hr = oracle.cif_hr(cif, STRIDE)
    fwd_o, _ = oracle.caf_scored(caf, hr, STRIDE, SKELETON)
    dense = caf_scored_mod.caf_scored(caf, np.asarray(hr), STRIDE,
                                      np.asarray(SKELETON))
    dense = {k: np.asarray(v) for k, v in dense.items()}

    rng = np.random.RandomState(0)
    checked = 0
    for e in range(caf.shape[0]):
        if not fwd_o[e]:
            continue
        # query near a random candidate source
        cand = fwd_o[e][rng.randint(len(fwd_o[e]))]
        x, y = cand[1] + rng.uniform(-2, 2), cand[2] + rng.uniform(-2, 2)
        s = rng.uniform(2.0, 12.0)

        v_o, x_o, y_o, s_o = oracle.grow_connection_blend(fwd_o[e], x, y, s)
        v_j, x_j, y_j, s_j = [
            float(r) for r in grow_mod.grow_connection_blend(
                {k: v for k, v in dense.items()}, e, x, y, s)]
        assert v_j == pytest.approx(v_o, abs=1e-5)
        if v_o > 0:
            assert x_j == pytest.approx(x_o, abs=1e-4)
            assert y_j == pytest.approx(y_o, abs=1e-4)
            assert s_j == pytest.approx(s_o, abs=1e-4)
        checked += 1
    assert checked >= 10


def match_poses(poses_a, poses_b, tol=1.0):
    """Greedy matching of pose lists by mean joint distance."""
    assert len(poses_a) == len(poses_b)
    used = set()
    for pa in poses_a:
        best, best_d = None, np.inf
        for i, pb in enumerate(poses_b):
            if i in used:
                continue
            mask = (pa[:, 0] > 0) & (pb[:, 0] > 0)
            if not np.any(mask):
                continue
            d = np.mean(np.linalg.norm(pa[mask, 1:3] - pb[mask, 1:3], axis=1))
            if d < best_d:
                best, best_d = i, d
        assert best is not None and best_d < tol, \
            f'pose unmatched (best distance {best_d})'
        used.add(best)


def test_full_decode_parity(two_person_fields):
    cif, caf, _ = two_person_fields

    poses_oracle = oracle.decode_cifcaf(cif, caf, STRIDE, SKELETON, 17)
    assert len(poses_oracle) == 2

    config = decode_mod.CifCafDecoderConfig(n_seeds=1024, n_hr_cells=512)
    decode = decode_mod.build_cifcaf_decoder(
        stride=STRIDE, skeleton=SKELETON, n_keypoints=17, config=config)
    poses, keep, order = decode(cif[None], caf[None])
    poses = np.asarray(poses[0])
    keep = np.asarray(keep[0])
    order = np.asarray(order[0])

    decoded = [poses[i] for i in order if keep[i]]
    assert len(decoded) == len(poses_oracle)
    match_poses(poses_oracle, decoded, tol=1.0)

    # joint confidences should agree closely
    for po, pd in zip(poses_oracle, decoded):
        mask = po[:, 0] > 0
        assert np.mean(np.abs(po[mask, 0] - pd[mask, 0])) < 0.05


def test_batch_chunked_decode_matches_vmap(two_person_fields):
    """Above batch_chunk_threshold the decoder runs lax.map over
    sub-batches (the batch-32 working-set fix, docs/perf.md); results
    must be identical to the plain vmapped graph."""
    cif, caf, _ = two_person_fields
    b = 6
    cif_b = np.broadcast_to(cif, (b, *cif.shape)).copy()
    caf_b = np.broadcast_to(caf, (b, *caf.shape)).copy()
    # perturb each image so lanes aren't trivially identical
    for i in range(b):
        cif_b[i, :, 1] *= 1.0 - 0.01 * i

    cfg = decode_mod.CifCafDecoderConfig(n_seeds=256, n_hr_cells=256)
    plain = decode_mod.build_cifcaf_decoder(
        stride=STRIDE, skeleton=SKELETON, n_keypoints=17,
        config=decode_mod.dataclasses.replace(cfg, batch_chunk=0))
    chunked = decode_mod.build_cifcaf_decoder(
        stride=STRIDE, skeleton=SKELETON, n_keypoints=17,
        config=decode_mod.dataclasses.replace(
            cfg, batch_chunk=2, batch_chunk_threshold=4))
    p0, k0, o0 = (np.asarray(a) for a in plain(cif_b, caf_b))
    p1, k1, o1 = (np.asarray(a) for a in chunked(cif_b, caf_b))
    np.testing.assert_array_equal(k0, k1)
    np.testing.assert_array_equal(o0, o1)
    np.testing.assert_allclose(p0, p1, atol=1e-6)


def _crowd_fields(n_people=40):
    rng = np.random.RandomState(7)
    anns = []
    centers = []
    for i in range(n_people):
        cx = 35.0 + (i % 8) * 80.0
        cy = 60.0 + (i // 8) * 90.0
        centers.append((cx, cy))
        anns.append(field_fixtures.annotation_dict(
            field_fixtures.synthetic_person(cx, cy, 65.0, rng)))
    cif, caf, _ = field_fixtures.fields_from_annotations(
        anns, (529, 673), stride=16)
    return cif, caf, np.array(centers)


def test_crowd_overflow_flag():
    """The small default budgets must flag a 40-person scene as overflowed
    (its active cells exceed n_hr_cells/n_seeds/n_caf_candidates)."""
    cif, caf, _ = _crowd_fields()
    decode = decode_mod.build_cifcaf_decoder(
        stride=16, skeleton=SKELETON, n_keypoints=17,
        config=decode_mod.CifCafDecoderConfig(), with_overflow=True)
    _, _, _, overflow = decode(cif[None], caf[None])
    assert bool(np.asarray(overflow)[0])

    # a 2-person scene must NOT overflow (stays on the fast tier)
    rng = np.random.RandomState(3)
    anns = [field_fixtures.annotation_dict(
        field_fixtures.synthetic_person(60.0 + 90.0 * i, 90.0, 70.0, rng))
        for i in range(2)]
    cif2, caf2, _ = field_fixtures.fields_from_annotations(
        anns, (257, 321), stride=16)
    decode2 = decode_mod.build_cifcaf_decoder(
        stride=16, skeleton=SKELETON, n_keypoints=17,
        config=decode_mod.CifCafDecoderConfig(), with_overflow=True)
    _, keep2, _, overflow2 = decode2(cif2[None], caf2[None])
    assert not bool(np.asarray(overflow2)[0])
    assert int(np.asarray(keep2).sum()) == 2


def test_crowd_decode():
    """A 40-person scene exercises the adaptive crowd tier: the default
    budgets overflow, the CifCaf decoder escalates to config.crowd(), and
    all people decode. Also covers the seed-lane chunk conds (poses in
    chunks 2 and 3 of the n_poses budget) and CAF candidate-compaction
    overflow (more active cells per edge plane than the top-K budget)."""
    import openpifpaf_tpu
    from openpifpaf_tpu.decoder.cifcaf import CifCaf

    cif, caf, centers = _crowd_fields()
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    for i, m in enumerate(datamodule.head_metas):
        m.head_index = i
        m.base_stride = 16
    dec = CifCaf(*datamodule.head_metas)
    annotations = dec.batch_decode([cif[None], caf[None]])[0]

    n_found = len(annotations)
    assert n_found >= 36, f'only {n_found} of 40 crowd poses decoded'

    # every decoded pose should be near one synthesized person center
    for ann in annotations:
        vis = ann.data[ann.data[:, 2] > 0]
        c = vis[:, :2].mean(axis=0)
        assert np.min(np.linalg.norm(centers - c, axis=1)) < 45.0


def test_crowd_escalation_per_image():
    """In a mixed batch only the overflowing image escalates: the sparse
    image keeps its bit-exact fast-tier result (decoded alone for
    comparison), the crowded image decodes through the batch-1 crowd
    graph, and the spliced outputs stay consistent (order a permutation,
    padded rows dropped)."""
    import openpifpaf_tpu
    from openpifpaf_tpu.decoder.cifcaf import CifCaf

    cif_crowd, caf_crowd, centers = _crowd_fields()
    rng = np.random.RandomState(11)
    anns = [field_fixtures.annotation_dict(
        field_fixtures.synthetic_person(90.0 + 170.0 * i, 140.0, 110.0, rng))
        for i in range(3)]
    cif_sparse, caf_sparse, _ = field_fixtures.fields_from_annotations(
        anns, (529, 673), stride=16)

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    for i, m in enumerate(datamodule.head_metas):
        m.head_index = i
        m.base_stride = 16
    dec = CifCaf(*datamodule.head_metas)

    cif_b = np.stack([cif_sparse, cif_crowd])
    caf_b = np.stack([caf_sparse, caf_crowd])
    anns_sparse, anns_crowd = dec.batch_decode([cif_b, caf_b])

    # the sparse lane must match its solo fast-tier decode exactly
    solo = dec.batch_decode([cif_sparse[None], caf_sparse[None]])[0]
    assert len(anns_sparse) == len(solo) == 3
    for a, b in zip(anns_sparse, solo):
        np.testing.assert_array_equal(a.data, b.data)

    # the crowded lane decodes through the crowd tier
    assert len(anns_crowd) >= 36
    for ann in anns_crowd:
        vis = ann.data[ann.data[:, 2] > 0]
        c = vis[:, :2].mean(axis=0)
        assert np.min(np.linalg.norm(centers - c, axis=1)) < 45.0

    # splice consistency: order stayed a permutation after padding
    parts = dec._decode_adaptive(16, (cif_b, caf_b))
    order = np.asarray(parts[2])
    n = order.shape[1]
    for row in order:
        assert sorted(row.tolist()) == list(range(n))


def test_crowd_tier_larger_pose_budget():
    """With n_poses_crowd > n_poses the escalation splice pads the
    fast-tier outputs along the pose axis (decoder/cifcaf.py
    _decode_adaptive): padded rows must stay keep=False, the order must
    remain a permutation of the crowd budget, and decoding must still
    find the people."""
    import openpifpaf_tpu
    from openpifpaf_tpu.decoder.cifcaf import CifCaf

    cif_crowd, caf_crowd, centers = _crowd_fields()
    rng = np.random.RandomState(13)
    anns = [field_fixtures.annotation_dict(
        field_fixtures.synthetic_person(90.0 + 170.0 * i, 140.0, 110.0, rng))
        for i in range(2)]
    cif_sparse, caf_sparse, _ = field_fixtures.fields_from_annotations(
        anns, (529, 673), stride=16)

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    for i, m in enumerate(datamodule.head_metas):
        m.head_index = i
        m.base_stride = 16
    dec = CifCaf(*datamodule.head_metas)
    dec.n_poses_crowd = 160  # crowd tier pose budget > fast tier's 96
    assert dec._crowd_config().n_poses == 160

    cif_b = np.stack([cif_sparse, cif_crowd])
    caf_b = np.stack([caf_sparse, caf_crowd])

    parts = dec._decode_adaptive(16, (cif_b, caf_b))
    poses, keep, order = (np.asarray(p) for p in parts[:3])
    assert poses.shape[1] == 160  # padded to the crowd budget
    # padded fast-tier rows are dropped (keep=False beyond the fast budget)
    assert not keep[0, 96:].any()
    for row in order:
        assert sorted(row.tolist()) == list(range(160))

    anns_sparse, anns_crowd = dec.batch_decode([cif_b, caf_b])
    assert len(anns_sparse) == 2
    assert len(anns_crowd) >= 36
    for ann in anns_crowd:
        vis = ann.data[ann.data[:, 2] > 0]
        c = vis[:, :2].mean(axis=0)
        assert np.min(np.linalg.norm(centers - c, axis=1)) < 45.0


def test_nms_suppression_chain():
    """Fixpoint keypoint NMS must match the sequential greedy scan on a
    suppression chain: A suppresses B, so B (suppressed) must NOT
    suppress C even though B's window covers C's cell
    (``nms_keypoints.cpp:17-69`` marks only unsuppressed joints)."""
    from openpifpaf_tpu.ops import nms as nms_mod

    n_kp = 3
    poses = np.zeros((3, n_kp, 4), dtype=np.float32)
    # joint 0 of each pose, reduction 2, sigma 4 -> reduced sigma 2:
    # A at x=10 marks reduced cells [3, 7); B at x=12 (cell 6, inside A)
    # would mark [4, 8); C at x=15 (cell 7: inside B's window, outside
    # A's)
    poses[0, 0] = [0.9, 10.0, 10.0, 4.0]
    poses[1, 0] = [0.8, 12.0, 10.0, 4.0]
    poses[2, 0] = [0.7, 15.0, 10.0, 4.0]
    # give every pose a second strong joint far away so the instance
    # score survives the per-joint suppression
    for i in range(3):
        poses[i, 1] = [0.9, 200.0 + 40.0 * i, 200.0, 4.0]

    out, keep, _ = nms_mod.nms_keypoints(poses, (321, 321))
    out = np.asarray(out)
    assert out[0, 0, 0] == pytest.approx(0.9)    # A kept
    # B suppressed by A (0.8 * 1e-5, then zeroed by keypoint threshold)
    assert out[1, 0, 0] == 0.0
    assert out[2, 0, 0] == pytest.approx(0.7)    # C survives: B marked nothing
    assert bool(np.asarray(keep)[2])


def test_seed_truncation_candidates():
    """Budget truncation is reported as a dense dropped-candidate mask
    (checked against pose occupancy by the decoder), not a blunt count:
    cells truncated by the 4 * n_seeds pre-rescore compaction are marked
    conservatively by raw threshold; cells that were rescored are marked
    exactly (rescored >= threshold and not selected by the top-k)."""
    rng = np.random.RandomState(0)
    f, h, w = 17, 9, 9
    cif = rng.uniform(0.5, 1.0, size=(f, 5, h, w)).astype(np.float32)
    hr = np.zeros((f, 65, 65), dtype=np.float32)
    n_above = f * h * w  # all 1377 cells pass the raw threshold

    # tight budget: 1377 - 4 * 16 cells never get rescored -> all marked
    _, cand = seeds_mod.cif_seeds(
        cif, hr, 8, threshold=0.2, n_seeds=16, return_candidates=True)
    assert int(np.asarray(cand['dropped']).sum()) == n_above - 4 * 16

    # wide budget: every cell is rescored, and with hr == 0 every
    # rescored value 0.9 * 0 + 0.1 * c falls below the 0.2 threshold ->
    # nothing could have been a seed, nothing is marked
    _, cand2 = seeds_mod.cif_seeds(
        cif, hr, 8, threshold=0.2, n_seeds=512, return_candidates=True)
    assert n_above <= 4 * 512
    assert not bool(np.asarray(cand2['dropped']).any())

    # supported hr: all 1377 rescored cells stay above threshold, the
    # top-k keeps 512 -> exactly the rest are marked dropped
    hr3 = np.full((f, 65, 65), 0.9, dtype=np.float32)
    out3, cand3 = seeds_mod.cif_seeds(
        cif, hr3, 8, threshold=0.2, n_seeds=512, return_candidates=True)
    assert int(np.asarray(cand3['dropped']).sum()) == n_above - 512
    # dropped candidates carry their own dense coordinates
    drop = np.asarray(cand3['dropped'])
    assert np.all(np.asarray(cand3['x'])[drop]
                  == np.asarray(cif[:, 2].reshape(-1) * 8)[drop])


def test_lazy_cifhr_matches_materialized():
    """eval_cells (lazy CifHr) must match accumulate_dense + cifhr_lookup
    at arbitrary query points, including out-of-bounds defaults."""
    rng = np.random.RandomState(7)
    F, K = 5, 64
    hs, ws = 97, 129
    cells = {
        'x': rng.uniform(-5, ws + 5, (F, K)).astype(np.float32),
        'y': rng.uniform(-5, hs + 5, (F, K)).astype(np.float32),
        'sigma': rng.uniform(1.0, 12.0, (F, K)).astype(np.float32),
        'w': rng.uniform(0.0, 0.08, (F, K)).astype(np.float32),
    }
    cells['w'][:, K // 2:] = 0.0  # padding lanes

    hr = cifhr_mod.accumulate_dense(
        jnp.asarray(cells['x']), jnp.asarray(cells['y']),
        jnp.asarray(cells['sigma']), jnp.asarray(cells['w'] * 16.0),
        hr_h=hs, hr_w=ws)

    q = 200
    xq = rng.uniform(-3, ws + 3, (F, q)).astype(np.float32)
    yq = rng.uniform(-3, hs + 3, (F, q)).astype(np.float32)
    f_idx = np.broadcast_to(np.arange(F, dtype=np.int32)[:, None], (F, q))

    ref = cifhr_mod.cifhr_lookup(np.asarray(hr), f_idx, xq, yq, default=-1.0)
    lazy = cifhr_mod.eval_cells(
        {k: jnp.asarray(v) for k, v in cells.items()},
        xq, yq, hs=hs, ws=ws, default=-1.0)
    np.testing.assert_allclose(np.asarray(lazy), np.asarray(ref),
                               rtol=0, atol=1e-5)
