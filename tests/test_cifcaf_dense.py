"""CifCafDense: the --dense-connections decode path.

Reference ``decoder/cifcaf.py:17-78``: a sparse CAF head and a dense CAF
head (COCO: the 25 DENSER connections) are concatenated along the field
axis and decoded by one CifCaf over the combined skeleton. The dense
meta's decoder_confidence_scales are set to the coupling factor; the
reference's C++ snapshot stores but never consumes them
(``csrc/src/cifcaf.cpp:299-301`` is commented out), and this
implementation matches that behavior.
"""

import numpy as np
import pytest

import field_fixtures
import openpifpaf_tpu
from openpifpaf_tpu import decoder as decoder_mod
from openpifpaf_tpu import headmeta
from openpifpaf_tpu.decoder.cifcaf import CifCaf, CifCafDense


@pytest.fixture()
def dense_head_metas():
    from openpifpaf_tpu.plugins.coco.cocokp import CocoKp
    saved = CocoKp.with_dense
    CocoKp.with_dense = True
    try:
        dm = CocoKp()
    finally:
        CocoKp.with_dense = saved
    for i, m in enumerate(dm.head_metas):
        m.head_index = i
        m.base_stride = 16
    return dm.head_metas


def _scene_fields(metas, n_people=3, hw=(257, 385)):
    cif_meta, caf_meta, dcaf_meta = metas
    rng = np.random.RandomState(5)
    anns = [field_fixtures.annotation_dict(
        field_fixtures.synthetic_person(70.0 + 120.0 * i, 120.0, 90.0, rng))
        for i in range(n_people)]
    cif, caf, _ = field_fixtures.fields_from_annotations(
        anns, hw, stride=16, metas=(cif_meta, caf_meta))
    _, dcaf, _ = field_fixtures.fields_from_annotations(
        anns, hw, stride=16, metas=(cif_meta, dcaf_meta))
    return cif, caf, dcaf


def test_factory_routing(dense_head_metas):
    """--dense-connections routes decoding to CifCafDense: CifCaf.factory
    yields nothing and CifCafDense.factory pairs (cif, caf, dense)."""
    saved = CifCafDense.dense_coupling
    try:
        CifCafDense.dense_coupling = 1.0
        assert CifCaf.factory(dense_head_metas) == []
        dense = CifCafDense.factory(dense_head_metas)
        assert len(dense) == 1
        dec = dense[0]
        # concatenated skeleton: 19 sparse + 25 dense edges
        assert len(dec.cifcaf.skeleton) == 19 + 25
        # coupling factor recorded on the dense meta (reference
        # cifcaf.py:36-39; stored, not consumed — cifcaf.cpp:299-301)
        assert dec.dense_caf_meta.decoder_confidence_scales == [1.0] * 25

        # without the flag: CifCafDense yields nothing, CifCaf decodes
        CifCafDense.dense_coupling = 0.0
        assert CifCafDense.factory(dense_head_metas) == []
        assert len(CifCaf.factory(dense_head_metas)) >= 1
    finally:
        CifCafDense.dense_coupling = saved


def test_dense_decode(dense_head_metas):
    """Decoding with concatenated sparse+dense CAF fields finds every
    person, and poses match the sparse-only decode (the dense field of a
    clean synthetic scene adds consistent connections, not new people)."""
    cif, caf, dcaf = _scene_fields(dense_head_metas)

    saved = CifCafDense.dense_coupling
    try:
        CifCafDense.dense_coupling = 1.0
        dec = CifCafDense.factory(dense_head_metas)[0]
        anns_dense = dec.batch_decode(
            [cif[None], caf[None], dcaf[None]])[0]
    finally:
        CifCafDense.dense_coupling = saved

    sparse_dec = CifCaf(dense_head_metas[0], dense_head_metas[1])
    anns_sparse = sparse_dec.batch_decode([cif[None], caf[None]])[0]

    assert len(anns_dense) == len(anns_sparse) == 3
    for da, sa in zip(anns_dense, anns_sparse):
        vis = (da.data[:, 2] > 0) & (sa.data[:, 2] > 0)
        assert vis.sum() >= 10
        np.testing.assert_allclose(da.data[vis, :2], sa.data[vis, :2],
                                   atol=1.5)

    # single-image __call__ wrapper agrees with batch_decode
    solo = dec([cif, caf, dcaf])
    assert len(solo) == 3


def test_dense_decoder_factory_integration(dense_head_metas):
    """decoder.factory.factory builds a Multi around CifCafDense when the
    coupling is configured (reference factory.py:148-172)."""
    saved = CifCafDense.dense_coupling
    try:
        CifCafDense.dense_coupling = 0.5
        multi = decoder_mod.factory.factory(dense_head_metas)
        names = [type(d).__name__ for d in multi.decoders]
        assert 'CifCafDense' in names
        assert 'CifCaf' not in names
    finally:
        CifCafDense.dense_coupling = saved


def test_concatenated_meta_semantics(dense_head_metas):
    """headmeta.Caf.concatenate keeps the sparse head's index/stride and
    appends the dense skeleton after the sparse one."""
    cif_meta, caf_meta, dcaf_meta = dense_head_metas
    saved = CifCafDense.dense_coupling
    try:
        CifCafDense.dense_coupling = 1.0
        dec = CifCafDense(cif_meta, caf_meta, dcaf_meta)
    finally:
        CifCafDense.dense_coupling = saved
    concat = dec.cifcaf.caf_meta
    assert concat.head_index == caf_meta.head_index
    assert concat.stride == caf_meta.stride
    assert list(map(tuple, concat.skeleton[:19])) \
        == list(map(tuple, caf_meta.skeleton))
    assert list(map(tuple, concat.skeleton[19:])) \
        == list(map(tuple, dcaf_meta.skeleton))
    assert isinstance(concat, headmeta.Caf)
