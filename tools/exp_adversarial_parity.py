"""Characterize decode divergence vs the reference C++ decoder on
contested scenes (overlapping/interpenetrating people).

Generates randomized scenes with 2-5 people whose torsos overlap, runs
both decoders, and aggregates agreement statistics. Used to set the
bounds in tests/test_adversarial_parity.py and the characterization in
docs/perf.md.
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', 'tests'))

import field_fixtures  # noqa: E402

CSRC = '/root/reference/src/openpifpaf/csrc'
BUILD_DIR = '/tmp/ref_decoder_build'


def load_reference_decoder():
    import torch
    import torch.utils.cpp_extension as ce
    os.makedirs(BUILD_DIR, exist_ok=True)
    ce.load(name='openpifpaf_ref_decoder',
            sources=sorted(glob.glob(os.path.join(CSRC, 'src', '*.cpp'))),
            extra_include_paths=[os.path.join(CSRC, 'include')],
            extra_cflags=['-std=c++17', '-O2'],
            build_directory=BUILD_DIR, is_python_module=False,
            verbose=False)
    return torch


def overlapping_scene(seed, hw=(169, 217), stride=8, conf_jitter=0.0):
    """2-5 people with overlapping torsos: cluster centers within a
    fraction of body size, varied scales, jittered joints.

    conf_jitter > 0 multiplies every confidence cell by
    ``1 + U(-conf_jitter, conf_jitter)`` — breaking the bit-equal
    seed-score ties of raw encoder targets, whose order the
    reference's unstable ``std::sort`` leaves implementation-defined
    (``cif_seeds.cpp:93-97``). Tie-free scenes decode pose-for-pose
    identically to the reference (docs/perf.md)."""
    rng = np.random.RandomState(seed)
    n_people = rng.randint(2, 6)
    h, w = hw
    cx0 = rng.uniform(70, w - 70)
    cy0 = rng.uniform(75, h - 75)
    anns = []
    for _ in range(n_people):
        size = rng.uniform(60.0, 130.0)
        # centers within ~0.15-0.5 of the body size: torsos cross
        dx = rng.uniform(-0.5, 0.5) * size * 0.6
        dy = rng.uniform(-0.5, 0.5) * size * 0.6
        kps = field_fixtures.synthetic_person(
            np.clip(cx0 + dx, 45, w - 45), np.clip(cy0 + dy, 55, h - 55),
            size, rng)
        anns.append(field_fixtures.annotation_dict(kps))
    cif, caf, _ = field_fixtures.fields_from_annotations(anns, hw,
                                                         stride=stride)
    if conf_jitter:
        jr = np.random.RandomState(1000 + seed)
        cif[:, 1] *= (1.0 + jr.uniform(-conf_jitter, conf_jitter,
                                       size=cif[:, 1].shape)
                      ).astype(np.float32)
        caf[:, 1] *= (1.0 + jr.uniform(-conf_jitter, conf_jitter,
                                       size=caf[:, 1].shape)
                      ).astype(np.float32)
    return cif, caf, n_people


def match_stats(ref_poses, our_poses):
    """Greedy matching; per-scene agreement statistics."""
    used = set()
    matched = 0
    joint_agree = 0
    joint_total = 0
    loc_err = []
    conf_err = []
    for rp in ref_poses:
        best, best_d = None, None
        for i, op in enumerate(our_poses):
            if i in used:
                continue
            vis = (rp[:, 0] > 0) & (op[:, 0] > 0)
            if not np.any(vis):
                continue
            d = float(np.linalg.norm(rp[vis, 1:3] - op[vis, 1:3],
                                     axis=1).mean())
            if best_d is None or d < best_d:
                best, best_d = i, d
        if best is None or best_d > 10.0:
            continue
        used.add(best)
        matched += 1
        op = our_poses[best]
        vis_both = (rp[:, 0] > 0) & (op[:, 0] > 0)
        joint_agree += int(np.sum((rp[:, 0] > 0) == (op[:, 0] > 0)))
        joint_total += rp.shape[0]
        if np.any(vis_both):
            loc_err.append(float(np.linalg.norm(
                rp[vis_both, 1:3] - op[vis_both, 1:3], axis=1).mean()))
            conf_err.append(float(np.abs(
                rp[vis_both, 0] - op[vis_both, 0]).max()))
    return {
        'n_ref': len(ref_poses), 'n_our': len(our_poses),
        'matched': matched,
        'joint_agree': joint_agree, 'joint_total': joint_total,
        'mean_loc_err': float(np.mean(loc_err)) if loc_err else 0.0,
        'max_loc_err': float(np.max(loc_err)) if loc_err else 0.0,
        'max_conf_err': float(np.max(conf_err)) if conf_err else 0.0,
    }


def main(n_seeds=50):
    torch = load_reference_decoder()
    import dataclasses

    import openpifpaf_tpu
    from openpifpaf_tpu.ops import CifCafDecoderConfig, build_cifcaf_decoder

    datamodule = openpifpaf_tpu.datasets.factory('cocokp')
    cif_meta, caf_meta = datamodule.head_metas
    skeleton = np.asarray(caf_meta.skeleton, dtype=np.int64)
    stride = 8
    adaptive = '--raw' not in sys.argv
    escalated = 0
    if adaptive:
        # the product path: fast tier + crowd escalation on overflow
        # (what Predictor/eval run)
        from openpifpaf_tpu.decoder.cifcaf import CifCaf

        cifcaf = CifCaf(cif_meta, caf_meta)

        def decode(cif, caf):
            nonlocal escalated
            fast = cifcaf._decoder(stride)
            *_, over = fast(cif[None], caf[None])
            escalated += int(np.asarray(over).any())
            poses, keep, _ = cifcaf._decode_adaptive(stride, (cif[None],
                                                              caf[None]))
            return np.asarray(poses), np.asarray(keep)
    else:
        cfg = CifCafDecoderConfig()
        if '--blob-compact' in sys.argv:
            cfg = dataclasses.replace(cfg, seed_blob_compact=True)
        if '--crowd' in sys.argv:
            cfg = cfg.crowd()
        raw_decoder = build_cifcaf_decoder(stride=stride,
                                           skeleton=caf_meta.skeleton,
                                           n_keypoints=17,
                                           config=cfg)

        def decode(cif, caf):
            poses, keep, _ = raw_decoder(cif[None], caf[None])
            return np.asarray(poses), np.asarray(keep)

    jitter = 0.01 if '--jitter' in sys.argv else 0.0
    rows = []
    for seed in range(n_seeds):
        cif, caf, n_people = overlapping_scene(seed, conf_jitter=jitter)
        ref = torch.classes.openpifpaf_decoder.CifCaf(
            17, torch.from_numpy(skeleton) - 1)
        ref_anns, _ = ref.call(torch.from_numpy(cif), stride,
                               torch.from_numpy(caf), stride)
        ref_poses = list(ref_anns.numpy())

        poses, keep = decode(cif, caf)
        our_poses = list(poses[0][keep[0] > 0])

        row = match_stats(ref_poses, our_poses)
        row['seed'] = seed
        row['n_people'] = n_people
        rows.append(row)
        if row['n_ref'] != row['n_our'] or row['matched'] < row['n_ref']:
            print('DIVERGE', json.dumps(row), flush=True)

    count_equal = sum(r['n_ref'] == r['n_our'] for r in rows)
    all_matched = sum(r['matched'] == r['n_ref'] for r in rows)
    ja = sum(r['joint_agree'] for r in rows)
    jt = sum(r['joint_total'] for r in rows)
    print(json.dumps({
        'scenes': len(rows),
        'count_equal': count_equal,
        'all_ref_matched': all_matched,
        'escalated': escalated if adaptive else None,
        'joint_visibility_agreement': round(ja / max(jt, 1), 4),
        'mean_loc_err_px': round(float(np.mean(
            [r['mean_loc_err'] for r in rows if r['matched']])), 3),
        'max_loc_err_px': round(float(np.max(
            [r['max_loc_err'] for r in rows])), 3),
        'max_conf_err': round(float(np.max(
            [r['max_conf_err'] for r in rows])), 4),
    }, indent=1))


if __name__ == '__main__':
    _n = [a for a in sys.argv[1:] if not a.startswith('--')]
    main(int(_n[0]) if _n else 50)
