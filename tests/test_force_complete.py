"""Force-complete-pose parity test: device pipeline vs sequential oracle."""

import numpy as np

import oracle
import field_fixtures

from openpifpaf_tpu.ops import decode_cifcaf as decode_mod
from openpifpaf_tpu.plugins.coco import constants

STRIDE = 8
SKELETON = constants.COCO_PERSON_SKELETON


def test_force_complete_parity():
    rng = np.random.RandomState(7)
    kps = field_fixtures.synthetic_person(60.0, 60.0, 80.0, rng)
    # hide some joints so force-complete has work to do
    kps[14:, 2] = 0.0  # knees/ankles partially
    anns = [field_fixtures.annotation_dict(kps)]
    cif, caf, _ = field_fixtures.fields_from_annotations(
        anns, (129, 129), stride=STRIDE)

    poses_oracle = oracle.decode_cifcaf(
        cif, caf, STRIDE, SKELETON, 17, force_complete=True)
    assert len(poses_oracle) == 1
    # all joints filled after force-complete + flood fill
    assert np.all(poses_oracle[0][:, 0] > 0.0)

    config = decode_mod.CifCafDecoderConfig(
        n_seeds=1024, n_hr_cells=512,
        force_complete=True,
        keypoint_threshold=0.0, keypoint_threshold_rel=0.0,
        nms_keypoint_threshold=0.0)
    decode = decode_mod.build_cifcaf_decoder(
        stride=STRIDE, skeleton=SKELETON, n_keypoints=17, config=config)
    poses, keep, order = decode(cif[None], caf[None])
    poses = np.asarray(poses[0])
    keep = np.asarray(keep[0])
    order = np.asarray(order[0])

    decoded = [poses[i] for i in order if keep[i]]
    assert len(decoded) == 1
    assert np.all(decoded[0][:, 0] > 0.0)

    po, pd = poses_oracle[0], decoded[0]
    # strong joints must agree in position
    strong = po[:, 0] > 0.1
    d = np.linalg.norm(po[strong, 1:3] - pd[strong, 1:3], axis=1)
    assert np.max(d) < 1.0
