def test_import():
    import openpifpaf_tpu

    assert 'cocokp' in openpifpaf_tpu.DATAMODULES
    assert 'cocodet' in openpifpaf_tpu.DATAMODULES
    assert 'shufflenetv2k16' in openpifpaf_tpu.BASE_FACTORIES


def test_headmeta():
    import openpifpaf_tpu

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif, caf = datamodule.head_metas
    assert cif.n_fields == 17
    assert caf.n_fields == 19
    assert cif.n_components == 5   # logb, c, x, y, scale
    assert caf.n_components == 8   # logb, c, x1, y1, x2, y2, s1, s2
