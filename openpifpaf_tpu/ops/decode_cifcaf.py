"""The full CifCaf decode pipeline as one jit-compatible device function.

Reference orchestration: ``csrc/src/cifcaf.cpp:116-262``. Stages:
CifHr accumulation -> seed extraction -> CAF candidate rescoring ->
(parallel) greedy growth -> keypoint NMS. Everything here runs with static
shapes on device; the only host work afterwards is converting the fixed-size
pose tensor into Annotation objects.
"""

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cifhr as cifhr_mod
from . import seeds as seeds_mod
from . import caf_scored as caf_scored_mod
from . import grow as grow_mod
from . import nms as nms_mod


@dataclasses.dataclass(frozen=True)
class CifCafDecoderConfig:
    """Static decoder configuration (hashable: safe as a jit static arg).

    Defaults mirror the reference C++ statics
    (``cif_hr.cpp:13-15``, ``cif_seeds.cpp:11``, ``caf_scored.cpp:11``,
    ``cifcaf.cpp:18-24``, ``nms_keypoints.cpp:12-14``).
    """
    cifhr_threshold: float = 0.3
    cifhr_neighbors: int = 16
    cifhr_min_scale: float = 0.0

    seed_threshold: float = 0.2
    seed_rescore: bool = True
    seed_ablation_nms: bool = False  # --ablation-cifseeds-nms
    cifhr_skip: bool = False  # both no-rescore ablations active

    caf_score_th: float = 0.3
    caf_cif_floor: float = 0.1
    caf_rescore: bool = True

    keypoint_threshold: float = 0.15
    keypoint_threshold_rel: float = 0.5
    reverse_match: bool = True
    filter_sigmas: float = 1.0
    #: 'blend' (default, top-2 within-sigma blend) or 'max'
    #: (--connection-method, reference cifcaf.cpp:32-113)
    connection_method: str = 'blend'
    greedy: bool = False
    block_joints: bool = False  # --cifcaf-block-joints
    force_complete: bool = False
    force_complete_caf_th: float = 0.001
    nms_before_force_complete: bool = False

    nms_suppression: float = 1e-5
    nms_instance_threshold: float = 0.15
    nms_keypoint_threshold: float = 0.15
    occupancy_reduction: float = 2.0
    occupancy_min_scale: float = 4.0

    # static work budgets (TPU shapes must be fixed). The defaults cover
    # ~10 people; the decoder emits an in-graph overflow flag whenever a
    # budget was actually exceeded, and the python CifCaf decoder then
    # re-runs the image through a crowd-tier decoder (see
    # :meth:`crowd`) — so sparse scenes ride the small fast graph and
    # crowded scenes stay exact.
    n_hr_cells: int = 256
    n_seeds: int = 256
    n_poses: int = 96
    #: top-K compaction of the CAF candidate axis before growth
    #: (0 = keep full dense planes); exact whenever fewer than this many
    #: cells of a directed-edge plane pass the score threshold — a person
    #: activates ~16 cells per plane
    n_caf_candidates: int = 256
    seed_nms: bool = True
    #: after growth, accept lanes exactly like the reference's
    #: sequential seed gate (cifcaf.cpp:206-211): lane j is rejected iff
    #: an earlier-seed-rank accepted lane's pose covers j's seed cell.
    #: This pins pose *provenance* (which seed a person's pose grows
    #: from) to the reference, making joint confidences match on
    #: contested scenes (see seeds.seed_rank_dedup).
    seed_rank_dedup: bool = True
    #: batches larger than ``batch_chunk_threshold`` run as ``lax.map``
    #: over sub-batches of ``batch_chunk`` inside the one jitted graph:
    #: the vmapped top-k/NMS working sets regress past ~8 images
    #: (docs/perf.md). 0 disables chunking.
    batch_chunk: int = 8
    batch_chunk_threshold: int = 16
    #: opt-in: compact each keypoint confidence blob to its 3x3 local
    #: maximum before the n_seeds top-k, so one person's blobs (~16
    #: cells x 17 joints) cannot consume the whole static budget in
    #: contested scenes. Exact ONLY for encoder-consistent fields where
    #: all cells of one blob regress to the same target; for arbitrary
    #: NN fields the reference seeds every above-threshold cell
    #: (cif_seeds.cpp:33-114), so this stays off by default — budget
    #: starvation is instead detected exactly (uncovered truncated
    #: candidates raise the overflow flag) and handled by crowd-tier
    #: escalation.
    seed_blob_compact: bool = False
    #: 'auto' (-> 'lazy'), 'lazy' (splat cells evaluated at query points,
    #: no map materialization), 'pallas' (materialized map via the TPU
    #: kernel) or 'dense' (materialized via jnp)
    cifhr_impl: str = 'auto'
    #: skip candidate compaction in the force-complete pass (keep full
    #: dense planes); the crowd tier sets this so the near-zero-threshold
    #: completion candidates can never be truncated at any resolution
    force_complete_dense: bool = False
    #: disable the Pallas CifHr per-tile cell-compaction bound (crowd
    #: tier: a saturated tile can then never underestimate)
    cifhr_exact_tiles: bool = False
    #: additionally output per-joint (commit_edge, commit_step) arrays —
    #: the reference's per-annotation decoding_order (cifcaf.cpp:309-346),
    #: consumed by --show-decoding-order / --show-frontier-order /
    #: --show-only-decoded-connections
    export_decoding_order: bool = False

    def crowd(self, scale: int = 16) -> 'CifCafDecoderConfig':
        """The crowd-tier variant: budgets scaled to cover 40+ people
        (~25 CifHr cells, ~17 seeds and ~16 CAF cells per person per
        plane). Growth lanes (``n_poses``) scale too — every accepted
        seed of every person needs a lane (up to ~17 per person; the
        grower chunk-skips empty lanes, so unused lanes are cheap)."""
        return dataclasses.replace(
            self,
            n_hr_cells=max(self.n_hr_cells, 64 * scale),
            n_seeds=max(self.n_seeds, 256 * scale),
            n_caf_candidates=max(self.n_caf_candidates, 64 * scale)
            if self.n_caf_candidates else 0,
            n_poses=max(self.n_poses, 48 * scale),
            force_complete_dense=True,
            cifhr_exact_tiles=True)


def decode_cifcaf_single(cif, caf, initial_poses=None, *, stride, skeleton,
                         config, graph: grow_mod.SkeletonGraph):
    """Decode one image. cif: (F, 5, H, W), caf: (E, 8, H, W) float32.

    initial_poses: optional (K_init, n_kp, 4) partial poses (e.g. tracked
    annotations from the previous frame, ``cifcaf.cpp:177-201``). They are
    grown first; their joints suppress nearby seeds, and the output tensor
    keeps them in slots [0, K_init).

    Returns (poses, keep, order, overflow): poses (K_init + n_poses,
    n_kp, 4) [v, x, y, s] in hi-res pixels, keep mask, score-descending
    order, and a bool scalar — True when any static work budget
    (n_hr_cells / n_seeds / n_caf_candidates) was exceeded, i.e. the
    result may differ from an unbounded-budget decode and the caller
    should escalate to a crowd-tier config.
    """
    cfg = config
    _, _, h, w = cif.shape
    hr_shape = ((h - 1) * stride + 1, (w - 1) * stride + 1)

    impl = cfg.cifhr_impl
    if impl == 'auto':
        impl = 'lazy'

    hr = None
    hr_cells = None
    if cfg.cifhr_skip:
        # both rescore ablations active: the reference skips CifHr
        # accumulation entirely (decoder/cifcaf.py:210-211)
        hr_overflow = jnp.array(False)
        if impl == 'lazy':
            z = jnp.zeros((cif.shape[0], 1), jnp.float32)
            hr_cells = {'x': z, 'y': z, 'sigma': z, 'w': z}
        else:
            hr = jnp.zeros((cif.shape[0],) + hr_shape, jnp.float32)
    elif impl == 'lazy':
        hr_cells, _, _, hr_overflow = cifhr_mod.cif_hr_cells(
            cif, stride,
            threshold=cfg.cifhr_threshold,
            min_scale=cfg.cifhr_min_scale,
            neighbors=cfg.cifhr_neighbors,
            n_cells=cfg.n_hr_cells)
    else:
        hr, hr_overflow = cifhr_mod.cif_hr(
            cif, stride,
            threshold=cfg.cifhr_threshold,
            min_scale=cfg.cifhr_min_scale,
            neighbors=cfg.cifhr_neighbors,
            n_cells=cfg.n_hr_cells,
            impl=impl,
            exact_tiles=cfg.cifhr_exact_tiles,
            return_overflow=True)

    seeds, seed_cand = seeds_mod.cif_seeds(
        cif, hr, stride,
        threshold=cfg.seed_threshold,
        n_seeds=cfg.n_seeds,
        rescore=cfg.seed_rescore,
        nms=cfg.seed_ablation_nms,
        blob_compact=cfg.seed_blob_compact,
        hr_cells=hr_cells, hr_shape=hr_shape,
        return_candidates=True)

    caf_cands, caf_overflow = caf_scored_mod.caf_scored(
        caf, hr, stride, skeleton,
        score_th=cfg.caf_score_th,
        cif_floor=cfg.caf_cif_floor,
        rescore=cfg.caf_rescore,
        n_candidates=cfg.n_caf_candidates,
        hr_cells=hr_cells, hr_shape=hr_shape,
        return_overflow=True)
    overflow = hr_overflow | caf_overflow

    grow_kwargs = dict(
        only_max=cfg.connection_method == 'max',
        keypoint_threshold=cfg.keypoint_threshold,
        keypoint_threshold_rel=cfg.keypoint_threshold_rel,
        reverse_match=cfg.reverse_match,
        filter_sigmas=cfg.filter_sigmas,
        greedy=cfg.greedy,
        block_joints=cfg.block_joints)

    record = cfg.export_decoding_order
    if record:
        grow_kwargs['record_order'] = True

    initial_grown = None
    initial_ce = initial_cs = None
    seed_occ0 = None
    if initial_poses is not None:
        initial_grown = grow_mod.grow_from_poses(
            caf_cands, graph, initial_poses, **grow_kwargs)
        if record:
            initial_grown, initial_ce, initial_cs = initial_grown
        seed_occ0 = nms_mod.mark_occupancy(
            initial_grown, hr_shape,
            occupancy_reduction=cfg.occupancy_reduction,
            occupancy_min_scale=cfg.occupancy_min_scale)

    seeds_all = seeds
    n_all = seeds_all['v'].shape[0]
    if cfg.seed_nms:
        keep_idx, keep_valid = seeds_mod.seed_nms(
            seeds, graph.n_keypoints, hr_shape,
            n_keep=cfg.n_poses,
            reduction=cfg.occupancy_reduction,
            min_scale=cfg.occupancy_min_scale,
            occ0=seed_occ0)
        lane_granted = jnp.zeros((n_all,), bool).at[keep_idx].set(keep_valid)
        seeds = {k: v[keep_idx] for k, v in seeds.items()}
        seeds['v'] = jnp.where(keep_valid, seeds['v'], 0.0)
    else:
        lane_granted = jnp.arange(n_all) < cfg.n_poses
        seeds = {k: v[:cfg.n_poses] for k, v in seeds.items()}

    poses = grow_mod.grow_poses(caf_cands, graph, seeds, **grow_kwargs)
    commit_edge = commit_step = None
    if record:
        poses, commit_edge, commit_step = poses
    if initial_grown is not None:
        poses = jnp.concatenate([initial_grown, poses], axis=0)
        if record:
            commit_edge = jnp.concatenate([initial_ce, commit_edge], axis=0)
            commit_step = jnp.concatenate([initial_cs, commit_step], axis=0)

    if cfg.seed_rank_dedup:
        n_init = 0 if initial_grown is None else initial_grown.shape[0]
        accept = seeds_mod.seed_rank_dedup(
            poses, seeds['f'], seeds['x'], seeds['y'],
            seeds['v'] > 0.0, hr_shape,
            n_initial=n_init,
            reduction=cfg.occupancy_reduction,
            min_scale=cfg.occupancy_min_scale)
        poses = jnp.where(accept[:, None, None], poses, 0.0)
        if record:
            commit_edge = jnp.where(accept[:, None], commit_edge, -1)
            commit_step = jnp.where(accept[:, None], commit_step, -1)

    # Exactness certificate for the seed budgets (cifcaf.cpp:206-211
    # semantics, post hoc): every above-threshold seed candidate either
    # received a growth lane or must be covered by the occupancy of a
    # grown pose — exactly the cells the reference's seed gate would
    # have skipped. An uncovered truncated candidate (dropped at the
    # n_seeds top-k, suppressed by seed NMS without its suppressor's
    # pose covering it, or beyond the n_poses lanes) could be a missed
    # pose, so it raises the overflow flag and the caller escalates to
    # the crowd tier. Occupancy is taken from the grown poses BEFORE
    # force-complete/NMS, matching when the reference marks it.
    grown_occ = seeds_mod.occupancy_grid(
        poses, hr_shape,
        reduction=cfg.occupancy_reduction,
        min_scale=cfg.occupancy_min_scale)
    overflow = overflow | seeds_mod.uncovered_any(
        seed_cand['f'], seed_cand['x'], seed_cand['y'],
        seed_cand['dropped'], grown_occ,
        reduction=cfg.occupancy_reduction)
    overflow = overflow | seeds_mod.uncovered_any(
        seeds_all['f'], seeds_all['x'], seeds_all['y'],
        (seeds_all['v'] > 0.0) & ~lane_granted, grown_occ,
        reduction=cfg.occupancy_reduction)

    if cfg.force_complete:
        if cfg.nms_before_force_complete:
            # --nms-before-force-complete: an additional NMS pass on the
            # grown poses before completion (decoder/cifcaf.py:141-142)
            poses, pre_keep, _ = nms_mod.nms_keypoints(
                poses, hr_shape,
                suppression=cfg.nms_suppression,
                instance_threshold=cfg.nms_instance_threshold,
                keypoint_threshold=cfg.nms_keypoint_threshold,
                occupancy_reduction=cfg.occupancy_reduction,
                occupancy_min_scale=cfg.occupancy_min_scale)
            poses = jnp.where(pre_keep[:, None, None], poses, 0.0)
        # second grow pass on low-threshold candidates, no reverse match,
        # wide filter window (cifcaf.cpp:414-426), then flood fill.
        # The near-zero threshold keeps many more cells active, so the
        # completion pass gets a 4x budget at the fast tier (truncation
        # there raises the overflow flag, which escalates the decode);
        # the crowd tier skips compaction entirely so the completion
        # candidates can never be truncated at any resolution.
        fc_budget = 0 if cfg.force_complete_dense else 4 * cfg.n_caf_candidates
        caf_low, caf_low_overflow = caf_scored_mod.caf_scored(
            caf, hr, stride, skeleton,
            score_th=cfg.force_complete_caf_th,
            cif_floor=cfg.caf_cif_floor,
            rescore=cfg.caf_rescore,
            n_candidates=fc_budget,
            hr_cells=hr_cells, hr_shape=hr_shape,
            return_overflow=True)
        overflow = overflow | caf_low_overflow
        poses = grow_mod.grow_from_poses(
            caf_low, graph, poses,
            keypoint_threshold=cfg.keypoint_threshold,
            keypoint_threshold_rel=cfg.keypoint_threshold_rel,
            reverse_match=False,
            filter_sigmas=4.0,
            greedy=cfg.greedy,
            record_order=record)
        if record:
            # force-complete commits continue the decoding order after
            # the main pass (steps offset by the main loop's bound: the
            # greedy loop also counts failed edge attempts, so its bound
            # is n_kp + n_dir, grow.py::grow_from_pose)
            offset = graph.n_keypoints \
                + (2 * len(skeleton) if cfg.greedy else 0)
            poses, fc_ce, fc_cs = poses
            fresh = (commit_edge < 0) & (fc_ce >= 0)
            commit_edge = jnp.where(fresh, fc_ce, commit_edge)
            commit_step = jnp.where(fresh, fc_cs + offset, commit_step)
        poses = grow_mod.flood_fill_poses(graph, poses)

    poses, keep, order = nms_mod.nms_keypoints(
        poses, hr_shape,
        suppression=cfg.nms_suppression,
        instance_threshold=cfg.nms_instance_threshold,
        keypoint_threshold=cfg.nms_keypoint_threshold,
        occupancy_reduction=cfg.occupancy_reduction,
        occupancy_min_scale=cfg.occupancy_min_scale)
    if record:
        return poses, keep, order, commit_edge, commit_step, overflow
    return poses, keep, order, overflow


def build_cifcaf_decoder(*, stride: int, skeleton,
                         config: Optional[CifCafDecoderConfig] = None,
                         n_keypoints: Optional[int] = None,
                         with_initial_annotations: bool = False,
                         with_overflow: bool = False):
    """Build a jitted, batched CifCaf decoder.

    Returns fn(cif, caf) with cif (B, F, 5, H, W), caf (B, E, 8, H, W)
    -> (poses (B, n_poses, n_kp, 4), keep (B, n_poses), order (B, n_poses)).
    With ``config.export_decoding_order`` two extra outputs
    (B, n_poses, n_kp) int32 report each joint's committing directed edge
    and commit step. With ``with_overflow`` a final output (B,) bool
    reports per image whether any static work budget was exceeded
    (caller should re-decode with ``config.crowd()`` for exact results).
    """
    config = config or CifCafDecoderConfig()
    skeleton = np.asarray(skeleton, dtype=np.int32)
    if n_keypoints is None:
        n_keypoints = int(skeleton.max())
    graph = grow_mod.make_skeleton_graph(n_keypoints, skeleton)

    single = functools.partial(
        decode_cifcaf_single,
        stride=stride, skeleton=skeleton, config=config, graph=graph)

    def out(parts):
        # parts: (poses, keep, order[, commit_edge, commit_step], overflow)
        return parts if with_overflow else parts[:-1]

    # batch 1 (the predict/video path) skips the vmap: under vmap every
    # lax.cond in the pipeline degrades to a select that computes both
    # branches, which defeats the empty-lane-chunk skipping in grow
    def batched(*arrays):
        b = arrays[0].shape[0]
        if b == 1:
            parts = single(*(a[0] for a in arrays))
            return tuple(p[None] for p in parts)
        chunk = config.batch_chunk
        if chunk and b > config.batch_chunk_threshold and b % chunk == 0:
            # large batches regress: the vmapped top-k/NMS working sets
            # grow past their tiling sweet spot (docs/perf.md batch-32
            # fix). Run the batch as lax.map over sub-batches of the
            # measured saturation size, inside this same jitted graph —
            # no host round-trips, one compile.
            shaped = tuple(a.reshape(b // chunk, chunk, *a.shape[1:])
                           for a in arrays)
            parts = jax.lax.map(lambda xs: jax.vmap(single)(*xs), shaped)
            return tuple(p.reshape(b, *p.shape[2:]) for p in parts)
        return jax.vmap(single)(*arrays)

    if with_initial_annotations:
        @jax.jit
        def decode(cif, caf, initial_poses):
            return out(batched(cif, caf, initial_poses))
    else:
        @jax.jit
        def decode(cif, caf):
            return out(batched(cif, caf))

    return decode
