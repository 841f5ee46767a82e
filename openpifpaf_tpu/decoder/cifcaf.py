"""CifCaf decoder: wraps the jitted device pipeline.

Reference: ``decoder/cifcaf.py:81-277`` (python orchestration) +
``csrc/src/cifcaf.cpp`` (C++ pipeline). Here the entire pipeline is the
device function from :func:`openpifpaf_tpu.ops.build_cifcaf_decoder`; this
class holds CLI-configurable thresholds and does tensor -> Annotation
conversion.
"""

import argparse
import logging
import time
from typing import List

import numpy as np

from .base import Decoder
from .. import headmeta
from ..annotation import Annotation
from ..ops import CifCafDecoderConfig, build_cifcaf_decoder

LOG = logging.getLogger(__name__)


class CifCaf(Decoder):
    # CLI-configurable statics (mirroring cifcaf.py:127-211 flags)
    force_complete = False
    keypoint_threshold = 0.15
    keypoint_threshold_rel = 0.5
    greedy = False
    reverse_match = True
    dense_connections = 0.0
    nms_before_force_complete = False
    instance_threshold = 0.15
    seed_threshold = 0.2
    keypoint_threshold_nms = 0.15
    force_complete_caf_th = 0.001
    cifhr_threshold = 0.3
    caf_score_th = 0.3
    connection_method = 'blend'
    block_joints = False
    seed_rescore = True
    seed_ablation_nms = False
    caf_rescore = True
    ablation_independent_kp = False
    n_seeds = 256
    n_poses = 96
    #: pose budget of the crowd tier (None: same as n_poses). The crowd
    #: tier already scales cell/seed/candidate budgets 16x; raise this
    #: when scenes can exceed n_poses *instances* (e.g. >96 people).
    n_poses_crowd = None
    n_hr_cells = 256
    #: record each joint's committing edge + step in the device decode and
    #: fill Annotation.decoding_order / frontier_order. Enabled by
    #: show.cli when --show-decoding-order / --show-frontier-order /
    #: --show-only-decoded-connections is requested (a separate jitted
    #: graph, so it is not free by default).
    export_decoding_order = False
    #: run the decode on this local device index (fields are transferred
    #: there, over ICI on a multi-chip host). One TPU core executes one
    #: program at a time, so decode(i) can only overlap NN(i+1) on a
    #: *different* chip — the TPU-native analogue of the reference's
    #: CPU decode worker pool (decoder/decoder.py:29-47). Combined with
    #: the Predictor's deferred-materialize serving loop the two stages
    #: then pipeline across chips. None: decode stays wherever the
    #: fields live (single-chip default).
    decode_device = None

    def __init__(self, cif_meta: headmeta.Cif, caf_meta: headmeta.Caf):
        super().__init__()
        self.cif_meta = cif_meta
        self.caf_meta = caf_meta
        self.skeleton = np.asarray(caf_meta.skeleton, dtype=np.int32)
        self.n_keypoints = len(cif_meta.keypoints)
        self.score_weights = cif_meta.score_weights

        self.config = CifCafDecoderConfig(
            cifhr_threshold=self.cifhr_threshold,
            cifhr_skip=not self.seed_rescore and not self.caf_rescore,
            seed_threshold=self.seed_threshold,
            seed_rescore=self.seed_rescore,
            seed_ablation_nms=self.seed_ablation_nms,
            caf_score_th=self.caf_score_th,
            caf_rescore=self.caf_rescore,
            keypoint_threshold=self.keypoint_threshold,
            keypoint_threshold_rel=self.keypoint_threshold_rel,
            reverse_match=self.reverse_match,
            connection_method=self.connection_method,
            greedy=self.greedy,
            block_joints=self.block_joints,
            force_complete=self.force_complete,
            force_complete_caf_th=self.force_complete_caf_th,
            nms_before_force_complete=self.nms_before_force_complete,
            nms_instance_threshold=self.instance_threshold,
            nms_keypoint_threshold=self.keypoint_threshold_nms,
            n_seeds=self.n_seeds,
            n_poses=self.n_poses,
            n_hr_cells=self.n_hr_cells,
            export_decoding_order=self.export_decoding_order,
        )
        self._decoders = {}  # stride -> jitted batched decoder

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser):
        group = parser.add_argument_group('CifCaf decoder')
        group.add_argument('--force-complete-pose', dest='force_complete',
                           default=cls.force_complete, action='store_true')
        group.add_argument('--force-complete-caf-th', type=float,
                           default=cls.force_complete_caf_th,
                           help='CAF threshold for force complete. '
                                'Set to -1 to deactivate.')
        group.add_argument('--nms-before-force-complete',
                           default=False, action='store_true',
                           help='run an additional NMS before '
                                'completing poses')
        group.add_argument('--keypoint-threshold', type=float,
                           default=cls.keypoint_threshold,
                           help='filter keypoints by score')
        group.add_argument('--keypoint-threshold-rel', type=float,
                           default=cls.keypoint_threshold_rel,
                           help='filter keypoints by relative score')
        group.add_argument('--instance-threshold', type=float,
                           default=cls.instance_threshold,
                           help='filter instances by score')
        group.add_argument('--seed-threshold', type=float,
                           default=cls.seed_threshold)
        group.add_argument('--greedy', default=cls.greedy, action='store_true')
        group.add_argument('--connection-method',
                           default=cls.connection_method,
                           choices=('blend', 'max'),
                           help='connection blending (cifcaf.cpp:32-113)')
        group.add_argument('--cifcaf-block-joints', default=False,
                           action='store_true', help='block joints')
        assert cls.reverse_match
        group.add_argument('--no-reverse-match', dest='reverse_match',
                           default=True, action='store_false')
        group.add_argument('--ablation-cifseeds-nms',
                           default=False, action='store_true')
        group.add_argument('--ablation-cifseeds-no-rescore',
                           default=False, action='store_true')
        group.add_argument('--ablation-caf-no-rescore',
                           default=False, action='store_true')
        group.add_argument('--ablation-independent-kp',
                           default=False, action='store_true')
        group.add_argument('--decoder-seeds', type=int, default=cls.n_seeds,
                           help='static seed budget of the device decoder')
        group.add_argument('--decoder-poses', type=int, default=cls.n_poses,
                           help='static pose budget of the device decoder')
        group.add_argument('--decoder-crowd-poses', type=int,
                           default=cls.n_poses_crowd,
                           help='pose budget of the crowd escalation tier '
                                '(default: same as --decoder-poses)')

    @classmethod
    def configure(cls, args: argparse.Namespace):
        cls.force_complete = args.force_complete
        cls.force_complete_caf_th = args.force_complete_caf_th
        cls.nms_before_force_complete = args.nms_before_force_complete
        cls.keypoint_threshold = args.keypoint_threshold
        cls.keypoint_threshold_rel = args.keypoint_threshold_rel
        # reference: force-complete zeros the growth thresholds but keeps
        # the NMS keypoint threshold (decoder/cifcaf.py:178-198);
        # --ablation-independent-kp keeps the growth keypoint threshold
        cls.keypoint_threshold_nms = args.keypoint_threshold
        if args.force_complete:
            if not args.ablation_independent_kp:
                cls.keypoint_threshold = 0.0
            cls.keypoint_threshold_rel = 0.0
            cls.keypoint_threshold_nms = 0.0
        if args.seed_threshold < cls.keypoint_threshold:
            cls.keypoint_threshold = args.seed_threshold
        cls.instance_threshold = args.instance_threshold
        cls.seed_threshold = args.seed_threshold
        cls.greedy = args.greedy
        cls.connection_method = args.connection_method
        cls.block_joints = args.cifcaf_block_joints
        cls.reverse_match = args.reverse_match
        cls.seed_ablation_nms = args.ablation_cifseeds_nms
        cls.seed_rescore = not args.ablation_cifseeds_no_rescore
        cls.caf_rescore = not args.ablation_caf_no_rescore
        cls.ablation_independent_kp = args.ablation_independent_kp
        cls.n_seeds = args.decoder_seeds
        cls.n_poses = args.decoder_poses
        cls.n_poses_crowd = args.decoder_crowd_poses

    @classmethod
    def factory(cls, head_metas) -> List['CifCaf']:
        """Pair adjacent (Cif, Caf) metas (reference cifcaf.py:213-222)."""
        if CifCafDense.dense_coupling:
            return []  # --dense-connections requested: CifCafDense decodes
        return [
            cls(cif_meta, caf_meta)
            for cif_meta, caf_meta in zip(head_metas, head_metas[1:])
            if (isinstance(cif_meta, headmeta.Cif)
                and isinstance(caf_meta, headmeta.Caf))
        ]

    def _crowd_config(self):
        import dataclasses
        cfg = self.config.crowd()
        if self.n_poses_crowd:
            # explicit --decoder-crowd-poses overrides the auto-scaled
            # growth-lane budget (lanes cost NMS closure work; the user
            # knows their scene density better than the 48x heuristic)
            cfg = dataclasses.replace(cfg, n_poses=self.n_poses_crowd)
        return cfg

    def _decoder(self, stride, with_initial=False, crowd=False):
        key = (stride, with_initial, crowd)
        if key not in self._decoders:
            self._decoders[key] = build_cifcaf_decoder(
                stride=stride,
                skeleton=self.skeleton,
                config=self._crowd_config() if crowd else self.config,
                n_keypoints=self.n_keypoints,
                with_initial_annotations=with_initial,
                with_overflow=True)
        return self._decoders[key]

    def _decode_adaptive(self, stride, args, with_initial=False):
        return self._decode_adaptive_deferred(stride, args,
                                              with_initial=with_initial)()

    def _decode_adaptive_deferred(self, stride, args, with_initial=False):
        """Dispatch the fast-tier decode; return materialize().

        The fast-tier graph is dispatched immediately (device arrays
        only — no host sync), and the returned closure performs the
        synchronizing part: fetch the overflow flags and, if any image
        exceeded its budgets, escalate it through the crowd tier. The
        split lets a serving loop dispatch the NEXT batch's forward
        before synchronizing this batch's decode (see
        ``Predictor._run_batches``); on a multi-chip host with
        ``decode_device`` set the two stages then overlap on different
        chips.
        """
        *parts, overflow = self._decoder(
            stride, with_initial=with_initial)(*args)

        def materialize():
            return self._escalate(stride, args, parts, overflow,
                                  with_initial)

        return materialize

    def _escalate(self, stride, args, parts, overflow, with_initial):
        """Crowd-tier escalation of overflowing images (the synchronizing
        half of :meth:`_decode_adaptive_deferred`).

        Escalation is per image through the *batch-1* crowd graph: it
        compiles once and is then reused for every flagged image at any
        batch size, images that decoded exactly at the fast tier keep
        their (already exact) results, and un-flagged images never pay
        the 16x crowd budgets. Fast-tier outputs are padded along the
        pose axis to the crowd tier's pose budget so flagged rows splice
        in; padded rows carry keep=False and sort last in the decoding
        order, so downstream annotation extraction skips them.
        """
        overflow = np.asarray(overflow)
        if not overflow.any():
            # (poses, keep, order) or, with export_decoding_order,
            # (poses, keep, order, commit_edge, commit_step)
            return parts
        LOG.debug('decoder budget overflow on %d/%d images: crowd tier',
                  int(overflow.sum()), overflow.shape[0])
        crowd_decoder = self._decoder(
            stride, with_initial=with_initial, crowd=True)
        # dispatch every flagged image first (device arrays only), then
        # materialize: the batch-1 crowd decodes overlap on device instead
        # of serializing on a host sync per image
        dispatched = {
            int(b): crowd_decoder(*(a[b:b + 1] for a in args))
            for b in np.nonzero(overflow)[0]
        }
        crowd_rows = {}
        crowd_overflow = False
        for b, (*crowd_parts, c_over) in dispatched.items():
            crowd_rows[b] = [np.asarray(p)[0] for p in crowd_parts]
            crowd_overflow |= bool(np.asarray(c_over)[0])
        if crowd_overflow:
            LOG.warning(
                'decode budgets exceeded even at the crowd tier '
                '(>~40 people or force-complete on a very large '
                'image); some instances may be missed — raise '
                'CifCafDecoderConfig budgets via --decoder-seeds '
                'or a custom config')
        parts = [np.asarray(p) for p in parts]
        n_fast = parts[0].shape[1]
        n_crowd = next(iter(crowd_rows.values()))[0].shape[0]
        out = []
        for i, p in enumerate(parts):
            if n_crowd > n_fast:
                pad = [(0, 0), (0, n_crowd - n_fast)] + \
                    [(0, 0)] * (p.ndim - 2)
                p = np.pad(p, pad)
                if i == 2:  # order stays a permutation of range(n_crowd)
                    p[:, n_fast:] = np.arange(n_fast, n_crowd,
                                              dtype=p.dtype)
            else:
                p = p.copy()
            for b, rows in crowd_rows.items():
                p[b] = rows[i]
            out.append(p)
        return out

    def _fields(self, fields_batch):
        # keep device arrays on device (no host round trip between the
        # forward pass and the jitted decode); numpy inputs pass through
        def as_f32(x):
            if isinstance(x, np.ndarray):
                return x.astype(np.float32, copy=False)
            return x
        cif = as_f32(fields_batch[self.cif_meta.head_index])
        caf = as_f32(fields_batch[self.caf_meta.head_index])
        if self.decode_device is not None:
            import jax
            devices = jax.local_devices()
            if self.decode_device < len(devices):
                dev = devices[self.decode_device]
                cif = jax.device_put(cif, dev)
                caf = jax.device_put(caf, dev)
            else:
                LOG.warning('decode_device=%d but only %d local devices; '
                            'decoding in place', self.decode_device,
                            len(devices))
        stride = self.cif_meta.stride
        assert stride == self.caf_meta.stride
        return cif, caf, stride

    def batch_decode(self, fields_batch, initial_annotations_batch=None):
        """fields_batch: list over head indices of (B, F, C, H, W) arrays."""
        return self.batch_decode_deferred(fields_batch,
                                          initial_annotations_batch)()

    def batch_decode_deferred(self, fields_batch,
                              initial_annotations_batch=None):
        """Dispatch the decode; return materialize() -> annotations.

        Between the dispatch and the materialize call the device works
        on the decode while the host is free to produce and dispatch
        the next batch's forward — the pipelined serving loop
        (``Predictor._run_batches``) calls materialize() one batch
        late. ``last_decoder_time`` accounts dispatch + materialize.
        """
        cif, caf, stride = self._fields(fields_batch)

        from ..visualizer import Base as VisualizerBase
        if VisualizerBase.all_indices:
            from .. import visualizer as visualizer_mod
            # only batch element 0: it is the image the visualizer base
            # stashed as the backdrop
            cif_np = np.asarray(cif[:1])
            caf_np = np.asarray(caf[:1])
            visualizer_mod.Cif(self.cif_meta).predicted(cif_np[0])
            visualizer_mod.Caf(self.caf_meta).predicted(caf_np[0])

        start = time.perf_counter()
        if initial_annotations_batch is None:
            deferred = self._decode_adaptive_deferred(stride, (cif, caf))
            ids_batch = None
        else:
            # pad initial annotations to a bucketed static size
            n_init = max((len(anns)
                          for anns in initial_annotations_batch), default=0)
            k_init = max(8, int(np.ceil(n_init / 8)) * 8)
            batch = cif.shape[0]
            initial_poses = np.zeros((batch, k_init, self.n_keypoints, 4),
                                     dtype=np.float32)
            ids_batch = np.full((batch, k_init), -1, dtype=np.int64)
            for b, anns in enumerate(initial_annotations_batch):
                for i, ann in enumerate(anns[:k_init]):
                    initial_poses[b, i, :, 0] = ann.data[:, 2]
                    initial_poses[b, i, :, 1] = ann.data[:, 0]
                    initial_poses[b, i, :, 2] = ann.data[:, 1]
                    initial_poses[b, i, :, 3] = ann.joint_scales
                    ids_batch[b, i] = getattr(ann, 'id_', -1) or -1
            deferred = self._decode_adaptive_deferred(
                stride, (cif, caf, initial_poses), with_initial=True)
        dispatch_time = time.perf_counter() - start

        def materialize():
            t0 = time.perf_counter()
            parts = deferred()
            poses, keep, order, *commit = [np.asarray(p) for p in parts]
            self.last_decoder_time = dispatch_time \
                + (time.perf_counter() - t0)
            return [
                self.annotations_from_tensor(
                    poses[i], keep[i], order[i],
                    ids=None if ids_batch is None else ids_batch[i],
                    commit_edge=commit[0][i] if commit else None,
                    commit_step=commit[1][i] if commit else None)
                for i in range(poses.shape[0])
            ]

        return materialize

    def __call__(self, fields, initial_annotations=None):
        initial = [initial_annotations] if initial_annotations else None
        return self.batch_decode([f[None] for f in fields], initial)[0]

    def annotations_from_tensor(self, poses, keep, order, ids=None,
                                commit_edge=None, commit_step=None):
        n_edges = len(self.skeleton)
        annotations = []
        for idx in order:
            if not keep[idx]:
                continue
            ann = Annotation(
                self.cif_meta.keypoints,
                self.caf_meta.skeleton,
                score_weights=self.score_weights)
            pose = poses[idx]
            ann.data[:, 0] = pose[:, 1]
            ann.data[:, 1] = pose[:, 2]
            ann.data[:, 2] = pose[:, 0]
            ann.joint_scales = pose[:, 3].copy()
            if ids is not None and idx < len(ids) and ids[idx] != -1:
                ann.id_ = int(ids[idx])
            if commit_edge is not None:
                self._fill_decoding_order(ann, commit_edge[idx],
                                          commit_step[idx], n_edges)
            annotations.append(ann)
        LOG.debug('annotations %d', len(annotations))
        return annotations

    def _fill_decoding_order(self, ann, commit_edge, commit_step, n_edges):
        """decoding_order entries (jsi, jti, jsxyv, jtxyv) in commit
        order, plus frontier_order: the directed edges whose target was
        never connected (the frontier at convergence). Joint coordinates
        are read back from the final pose (committed joints are immutable
        in the device grow loop, so they equal the commit-time values)."""
        committed = [(int(s), int(e)) for e, s in
                     zip(commit_edge, commit_step) if e >= 0]
        for _, edge in sorted(committed):
            if edge < n_edges:
                jsi, jti = (int(self.skeleton[edge][0]) - 1,
                            int(self.skeleton[edge][1]) - 1)
            else:
                jti, jsi = (int(self.skeleton[edge - n_edges][0]) - 1,
                            int(self.skeleton[edge - n_edges][1]) - 1)
            ann.decoding_order.append(
                (jsi, jti, ann.data[jsi].copy(), ann.data[jti].copy()))
        connected = {jti for _, jti, _, __ in ann.decoding_order}
        v = ann.data[:, 2]
        # --cifcaf-block-joints marks unreachable targets with v=1e-5 AT
        # THE ORIGIN; exclude those markers (the painter would draw a
        # line to (0, 0)). Truly-unconnected targets (v=0) stay in the
        # list for its semantic value; the painter's v>0 endpoint check
        # naturally skips drawing them.
        blocked = (v > 0.0) & (ann.data[:, 0] == 0.0) \
            & (ann.data[:, 1] == 0.0)
        for jsi, jti in (np.asarray(self.skeleton) - 1):
            for s, t in ((int(jsi), int(jti)), (int(jti), int(jsi))):
                if v[s] > 0 and v[t] <= 1e-5 and t not in connected \
                        and not blocked[t]:
                    ann.frontier_order.append((s, t))


class CifCafDense(Decoder):
    """Decode with sparse + dense CAF fields concatenated
    (reference ``decoder/cifcaf.py:17-78``)."""

    dense_coupling = 0.0

    def __init__(self, cif_meta: headmeta.Cif, caf_meta: headmeta.Caf,
                 dense_caf_meta: headmeta.Caf):
        super().__init__()
        self.cif_meta = cif_meta
        self.caf_meta = caf_meta
        self.dense_caf_meta = dense_caf_meta

        self.dense_caf_meta.decoder_confidence_scales = [
            self.dense_coupling for _ in self.dense_caf_meta.skeleton]
        concatenated = headmeta.Caf.concatenate([caf_meta, dense_caf_meta])
        self.cifcaf = CifCaf(cif_meta, concatenated)

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser):
        group = parser.add_argument_group('CifCafDense decoder')
        group.add_argument('--dense-connections', nargs='?', type=float,
                           default=0.0, const=1.0)

    @classmethod
    def configure(cls, args: argparse.Namespace):
        cls.dense_coupling = args.dense_connections

    @classmethod
    def factory(cls, head_metas):
        if len(head_metas) < 3 or not cls.dense_coupling:
            return []
        return [
            cls(cif_meta, caf_meta, dense_meta)
            for cif_meta, caf_meta, dense_meta
            in zip(head_metas, head_metas[1:], head_metas[2:])
            if (isinstance(cif_meta, headmeta.Cif)
                and isinstance(caf_meta, headmeta.Caf)
                and isinstance(dense_meta, headmeta.Caf))
        ]

    def batch_decode(self, fields_batch, initial_annotations_batch=None):
        merged = list(fields_batch)
        merged[self.caf_meta.head_index] = np.concatenate([
            np.asarray(fields_batch[self.caf_meta.head_index]),
            np.asarray(fields_batch[self.dense_caf_meta.head_index]),
        ], axis=1)
        # the concatenated meta reuses the sparse head index
        out = self.cifcaf.batch_decode(merged, initial_annotations_batch)
        self.last_decoder_time = self.cifcaf.last_decoder_time
        return out

    def __call__(self, fields, initial_annotations=None):
        initial = [initial_annotations] if initial_annotations else None
        return self.batch_decode([f[None] for f in fields], initial)[0]
