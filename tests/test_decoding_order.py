"""Decoding-order export (reference cifcaf.cpp:309-346 appends each
commit to Annotation::decoding_order; here the device grow loop records
per-joint (commit_edge, commit_step) arrays and the python decoder fills
``Annotation.decoding_order`` / ``frontier_order``)."""

import numpy as np
import pytest

import field_fixtures

import openpifpaf_tpu
from openpifpaf_tpu.decoder.cifcaf import CifCaf
from openpifpaf_tpu.ops import decode_cifcaf as decode_mod
from openpifpaf_tpu.plugins.coco import constants


@pytest.fixture()
def two_person_fields():
    rng = np.random.RandomState(7)
    anns = [
        field_fixtures.annotation_dict(
            field_fixtures.synthetic_person(90.0, 120.0, 130.0, rng)),
        field_fixtures.annotation_dict(
            field_fixtures.synthetic_person(240.0, 140.0, 110.0, rng)),
    ]
    cif, caf, _ = field_fixtures.fields_from_annotations(anns, (257, 353))
    return cif, caf


def _decoder(export):
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    for i, m in enumerate(datamodule.head_metas):
        m.head_index = i
        m.base_stride = 16
    old = CifCaf.export_decoding_order
    CifCaf.export_decoding_order = export
    try:
        return CifCaf(*datamodule.head_metas)
    finally:
        CifCaf.export_decoding_order = old


def test_decoding_order_recorded(two_person_fields):
    cif, caf = two_person_fields
    dec = _decoder(True)
    anns = dec.batch_decode([cif[None], caf[None]])[0]
    assert len(anns) == 2

    skeleton = np.asarray(constants.COCO_PERSON_SKELETON)
    for ann in anns:
        order = ann.decoding_order
        assert order, 'decoding order must be recorded'
        visible = {i for i in range(17) if ann.data[i, 2] > 1e-5}
        targets = [jti for _, jti, _, __ in order]
        # each joint is committed at most once
        assert len(targets) == len(set(targets))
        # every visible joint except the seed was committed via an edge
        assert set(targets) == visible - (visible - set(targets)), \
            'targets must be visible joints'
        seeds = visible - set(targets)
        assert len(seeds) == 1, 'exactly one seed joint per pose'

        committed = set(seeds)
        for jsi, jti, jsxyv, jtxyv in order:
            # sources were committed before their targets (valid growth)
            assert jsi in committed
            committed.add(jti)
            # the edge exists in the skeleton (either direction)
            assert any((jsi + 1, jti + 1) in ((s, e), (e, s))
                       for s, e in skeleton)
            # stored coordinates match the final pose
            np.testing.assert_allclose(jsxyv, ann.data[jsi], atol=1e-6)
            np.testing.assert_allclose(jtxyv, ann.data[jti], atol=1e-6)


def test_decoding_order_off_by_default(two_person_fields):
    cif, caf = two_person_fields
    dec = _decoder(False)
    anns = dec.batch_decode([cif[None], caf[None]])[0]
    assert anns and all(ann.decoding_order == [] for ann in anns)


def test_export_does_not_change_poses(two_person_fields):
    cif, caf = two_person_fields
    anns_plain = _decoder(False).batch_decode([cif[None], caf[None]])[0]
    anns_rec = _decoder(True).batch_decode([cif[None], caf[None]])[0]
    assert len(anns_plain) == len(anns_rec)
    for a, b in zip(anns_plain, anns_rec):
        np.testing.assert_array_equal(a.data, b.data)


def test_frontier_order_on_partial_pose():
    """A pose with undetectable joints (person half outside the image)
    leaves unconnected skeleton edges -> a non-empty frontier."""
    rng = np.random.RandomState(3)
    kps = field_fixtures.synthetic_person(150.0, 100.0, 160.0, rng)
    kps[[13, 14, 15, 16], 2] = 0.0  # hide knees + ankles
    ann = field_fixtures.annotation_dict(kps)
    cif, caf, _ = field_fixtures.fields_from_annotations([ann], (257, 353))

    dec = _decoder(True)
    anns = dec.batch_decode([cif[None], caf[None]])[0]
    assert anns
    top = anns[0]
    assert top.frontier_order, 'hidden joints must leave frontier edges'
    for jsi, jti in top.frontier_order:
        assert top.data[jsi, 2] > 0
        assert top.data[jti, 2] <= 1e-5


def test_greedy_mode_records_order(two_person_fields):
    cif, caf = two_person_fields
    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    for m in (cif_meta, caf_meta):
        m.base_stride = 16
    decode = decode_mod.build_cifcaf_decoder(
        stride=16, skeleton=caf_meta.skeleton,
        n_keypoints=len(cif_meta.keypoints),
        config=decode_mod.CifCafDecoderConfig(
            export_decoding_order=True, greedy=True))
    poses, keep, order, ce, cs = [np.asarray(p) for p in
                                  decode(cif[None], caf[None])]
    kept = [i for i in order[0] if keep[0][i]]
    assert kept
    for i in kept:
        assert np.any(ce[0][i] >= 0)
        # steps of committed joints are unique
        steps = cs[0][i][ce[0][i] >= 0]
        assert len(steps) == len(set(steps.tolist()))
