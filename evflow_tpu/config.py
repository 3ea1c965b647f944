"""Configuration for the evflow-tpu engine.

Every magic constant scattered through the reference C/C++/OpenCL apps is a named
field here (reference locations cited per field). Static shapes stay static — they
suit XLA — but are derived from this config instead of being sprinkled inline.

Reference constants:
  - ARRAY_SIZE=16384, WIDTH=1280, HEIGHT=720, MAX_HASH_SIZE=8192:
    event-cam-pre-processing-opencl/event-cam-sampling/metavision_sdk_get_started5_opencl_store.cpp:34-40
    build/coordinate_processor.cl:12,30
  - slice cadence 50 ms / 16384 events:
    event-cam-clustering-accel/.../metavision_sdk_get_started5_opencl_store.cpp:351;
    event-cam-tracking/event-cam-fast-corner-tracker/metavision_time_surface_periodic_group_track.cpp:773
  - AEClustering defaults (three divergent copies):
    async:   szBuffer=800, radius=20, minN=5, alpha=0.5, kappa=0  (AEClustering.cpp:7-17)
    accel:   szBuffer=800, radius=40, minN=10                     (accel/AEClustering.cpp:8-17)
    tracking:szBuffer=400, radius=60, minN=10                     (tracking/AEClustering.cpp:8-11)
  - k-means: k=8, threshold 50.0, convergence error_max>10:
    assign_to_centers.cl:11-25; assign_to_centers2.c:131,545-548
  - tracker params (30.0, 30, 10, 5, 0.8, 0.3, 100.0):
    metavision_time_surface_periodic_group_track.cpp:805-813
  - eFAST: circle3(16 px, streak 3-6), circle4(20 px, streak 4-8), border 4 px:
    metavision_time_surface_fast_corner.cpp:24-32; group_track.cpp:44-45,951-1054
  - NMS box 15, threshold 0.5: group_track.cpp:832-838
  - OPTICS defaults: min_pts=2, eps=10 per integration test
    (optics-clustering/test/cluster_event_data.cpp:449)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SensorConfig:
    """Event-camera geometry (Prophesee EVK: 1280x720)."""

    width: int = 1280
    height: int = 720

    @property
    def npixels(self) -> int:
        return self.width * self.height


@dataclasses.dataclass(frozen=True)
class SliceConfig:
    """Stream slicing: by event count or by time window.

    Mirrors Metavision EventBufferReslicerAlgorithm::Condition::make_n_events /
    make_n_us (reference …store.cpp:335-337, 349-352).
    """

    n_events: int = 16384        # events per slice (make_n_events)
    n_us: int = 50_000           # µs per slice (make_n_us)
    mode: str = "n_events"       # "n_events" | "n_us"


@dataclasses.dataclass(frozen=True)
class DedupConfig:
    """Hash-grid downsampling (coordinate_processor.cl).

    exact=False reproduces the reference's approximate hash-bucket dedup
    (collisions alias distinct pixels, cl:12); exact=True keys on the true
    pixel id y*width+x instead.
    """

    num_buckets: int = 8192      # MAX_HASH_SIZE (cl:29-30)
    hash_mul_x: int = 1619       # cl:12
    hash_mul_y: int = 31         # cl:12
    exact: bool = False
    # Reference consumer reads every 2nd unique coordinate (stride 4 over an
    # x,y-interleaved array, accel …store.cpp:435-445). Quirk-gated.
    compat_stride2: bool = False
    # Reference fabricates event timestamps for the cluster engine as
    # cumulative_unique_count/1000.0 (accel …store.cpp:439) instead of real
    # times — the szBuffer window then expires by "unique kilo-coords".
    compat_fabricated_ts: bool = False


@dataclasses.dataclass(frozen=True)
class ClusterConfig:
    """AEClustering parameters (AEClustering.{h,cpp})."""

    sz_buffer: int = 800         # sliding window of event times
    radius: float = 20.0         # Manhattan-distance gate
    alpha: float = 0.5           # EWMA weight for cluster mean
    kappa: int = 0               # sampled-member check count (0 = scan all)
    min_n: int = 5               # minimum membership for reporting
    max_clusters: int = 128      # fixed capacity (TPU-side; clusters are masked)
    max_members: int = 1024      # fixed capacity for the member ring buffer
    # Exact engine: events per lax.scan step (bit-equal blocked execution
    # with speculative fast path + per-event fallback,
    # aeclustering.update_slice_blocked). 0 = per-event scan — the measured
    # default: on TPU the speculation loses whenever >~2%% of events create/
    # merge/empty a cluster (one hazard poisons a whole block; measured
    # 295 vs 280 ms/slice even in the calm accel regime, r3 — blob-edge
    # satellite creation/merge churn keeps block hazard rates at 40-90%%).
    # Kept as an opt-in for genuinely stable-cluster streams.
    # Requires kappa == 0 (the deployed default), else ignored.
    exact_block: int = 0
    # r4: run the exact engine as ONE Pallas kernel per slice
    # (models/aeclustering_pallas.py — the whole per-event state machine in
    # a single Mosaic program, amortized-O(1) deque forget). Bit-equal to
    # the per-event scan on every state field (tested); measured 1.3-1.5
    # us/event vs the scan's 17.1 on TPU (benchmarks/prof_exact_pallas.py).
    # Used when kappa == 0 and the backend is TPU; the CPU backend keeps
    # the XLA scan (interpret-mode Pallas is slower there, results equal).
    exact_pallas: bool = True
    # r5: force the Pallas exact engine even off-TPU, via Mosaic interpret
    # mode. Slow — for TESTS that must exercise the Pallas path's program
    # (e.g. the temporal-window bit-parity test on the virtual CPU mesh,
    # VERDICT r4 task #4), not for production CPU runs.
    exact_pallas_interpret: bool = False
    # r4b: compute the fast path's per-slice EWMA ranks and cluster
    # aggregates with one-hot panel matmuls (blocked lower-triangular cumsum
    # on the MXU + one (C, N) @ (N, 5) aggregate matmul) instead of the
    # (ids, lane) sort + segment_sum scatters, and the merge-phase window
    # reductions with (C, C) root-matrix matmuls instead of 3 segment_sums.
    # Counts and ranks stay EXACT (0/1 and integer-valued f32 operands
    # accumulate exactly in the MXU's f32 accumulator; HIGHEST-precision
    # operands are split exactly); coordinate sums differ from the scatter
    # path only in fp reduction order (tests pass identically either way).
    # TPU A/B (r4b, chain-per-drain methodology, benchmarks/prof_inscan.py):
    # fastcluster in-scan 0.753 -> 0.494 ms/slice, fused full scan
    # 1.850 -> 1.582 — adopted as the default.
    stats_matmul: bool = True
    # r5: compute the per-slice ranks/EWMA-weights/(C,5) aggregates as ONE
    # Mosaic program (ops/pallas_kernels.py:cluster_stats) instead of the
    # stats_matmul XLA chain — the (N, C) one-hot/cumsum/weight panels stay
    # in VMEM. Counts/ranks exact; weighted sums differ only in fp
    # reduction order (same class as stats_matmul vs the scatter path).
    # Applies on the single-device path when N %% 2048 == 0 (mesh paths
    # keep the XLA form — collectives interleave the computation).
    # MEASURED A/B on TPU (r5, same session): Pallas 0.723 vs XLA matmul
    # 0.672 ms/slice — XLA already fuses this chain competitively (the
    # same verdict as the r2 fused-assignment kernel). Kept as the
    # validated Mosaic pattern; default off.
    stats_pallas: bool = False

    @staticmethod
    def async_app() -> "ClusterConfig":
        return ClusterConfig(sz_buffer=800, radius=20.0, min_n=5)

    @staticmethod
    def accel_app() -> "ClusterConfig":
        return ClusterConfig(sz_buffer=800, radius=40.0, min_n=10)

    @staticmethod
    def tracking_app() -> "ClusterConfig":
        return ClusterConfig(sz_buffer=400, radius=60.0, min_n=10)


@dataclasses.dataclass(frozen=True)
class KMeansConfig:
    """OpenCL k-means (assign_to_centers.cl + assign_to_centers2.c)."""

    k: int = 8
    assign_threshold: float = 50.0   # initial distance gate (cl:11)
    convergence_tol: float = 10.0    # loop while error_max > 10 (c:545-548)
    max_iters: int = 64
    # Compat: kernel emits center *byte-pair* index (0,2,..,14) and 255 for
    # unassigned (cl:12,22,26). Off by default; we use 0..k-1 and -1.
    compat_bytepair_labels: bool = False


@dataclasses.dataclass(frozen=True)
class EFastConfig:
    """eFAST corner detector on the SAE (group_track.cpp:944-1064)."""

    border: int = 4              # margin = max_scale*4 (group_track.cpp:951)
    streak3_min: int = 3
    streak3_max: int = 6
    streak4_min: int = 4
    streak4_max: int = 8
    # Candidate cap for the slice-sync detector: detection runs once per
    # touched PIXEL (newest event), compacted to this many lanes — duplicate
    # per-event detections at the same pixel are NMS-suppressed at distance 0
    # anyway, so the post-NMS corner set is unchanged whenever the slice
    # touches <= max_candidates unique pixels (beyond that, later pixels are
    # dropped in stream order). 0 disables (detect on every event, the
    # reference's literal per-event volume). 8192 mirrors the reference's
    # own MAX_HASH_SIZE dedup scale (coordinate_processor.cl:30).
    max_candidates: int = 8192
    # Micro-slice (q>1) detection backend: True routes each sub-slice through
    # the dense band stencil. Measured a LOSS on TPU (r4): sub-slices touch
    # nearly the SAME y-bands (every moving object emits in every sub-slice),
    # so q sparse stencil passes cost ~q full passes — the VERDICT-r3
    # hypothesis that bands partition across sub-slices does not hold on
    # real scenes. The candidate-proportional ring gather (candidates DO
    # partition across sub-slices) stays the q>1 default.
    micro_dense: bool = False
    # The built target indexes .at(y+c[i][0], x+c[i][1]) (group_track.cpp:968),
    # while fast_corner.cpp:944-1064 detects per EVENT against the evolving
    # surface; the slice-sync step detects once per slice against the full
    # slice's surface. micro_slices = Q > 1 splits each slice into Q
    # sub-scatters with detection per sub-slice, shrinking the approximation
    # window Q-fold (fidelity/throughput knee quantified in
    # benchmarks/corner_fidelity.py; tests/test_event_exact.py).
    micro_slices: int = 1
    # q>1 snapshot-stack backend (r5): build all q post-sub-slice surfaces
    # with one (q, H, W) keyed scatter-max + a sub-axis cummax, detection
    # per plane (statically unrolled, independent), instead of q
    # serially-dependent scatter+detect dispatches. Bit-equal to the
    # serial chain (tested). MEASURED A/B on TPU (r5, same session,
    # chain-per-drain): stack 1.73 vs serial 1.68 ms/slice corner step at
    # q=8 — the serial chain's dispatch dependency costs nothing XLA can't
    # hide, and the keyed 3-D scatter + cummax roughly offset the removed
    # chain. (First stack variant used the batched tall-image detector:
    # 1.4 ms/slice WORSE — gather cost grows with target footprint.)
    # Default stays the serial path; the stack remains available.
    micro_stack: bool = False
    # while fast_corner.cpp:294-298 uses the transposed order. True = group_track.
    group_track_axis_order: bool = True
    # Detection backend for the slice-sync step: True = dense per-band stencil
    # (Pallas kernel on TPU — the whole mask in one fused pass, bands without
    # events predicated off; banded XLA elsewhere; bit-identical to the ring
    # gather, r3 measured 1.61 vs 2.02 ms/slice on blob scenes). False = the
    # r2 8x8-block ring gather (candidate-count-proportional; used by the
    # micro-slice and tiled paths regardless).
    dense_detect: bool = True


@dataclasses.dataclass(frozen=True)
class NMSConfig:
    """Greedy first-come box suppression (CornerFilter, group_track.cpp:81-152)."""

    box_size: int = 15
    threshold: float = 0.5       # unused by the reference (response commented out)
    max_corners: int = 512       # fixed output capacity


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """CornerTracker / Luenberger-style observer (group_track.cpp:201-537)."""

    max_distance: float = 30.0
    max_frames: int = 30
    history: int = 10
    frames_to_skip: int = 5
    damping: float = 0.8
    smoothing: float = 0.3
    group_radius: float = 100.0  # value used at the call site (:812)
    weight_decay: float = 0.8    # calculateDirection exponential decay (:243)
    group_blend: float = 0.3     # velocity = 0.7*own + 0.3*group (:395)
    max_tracks: int = 256        # fixed capacity


@dataclasses.dataclass(frozen=True)
class OpticsConfig:
    """OPTICS reachability clustering (optics.hpp)."""

    min_pts: int = 2
    epsilon: float = -1.0        # <=0 → epsilon_estimation (hpp:369-387)
    max_neighbors: int = 256     # fixed cap for TPU neighbor lists
    chi: float = 0.1
    steep_area_min_diff: float = 0.0


@dataclasses.dataclass(frozen=True)
class DBSCANConfig:
    """DBSCAN (point-cloud-clustering/DBSCAN_simple.h + pcl_cluster.cpp)."""

    eps: float = 20.0            # setClusterTolerance (pcl_cluster.cpp:115)
    core_min_pts: int = 20       # setCorePointMinPts (:116)
    min_cluster_size: int = 100  # (:117)
    max_cluster_size: int = 25000


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """Centroid-difference optical flow (accel …store.cpp:461-557)."""

    extrapolation: float = 1.0   # accel draws ×1; tracking app ×3 (:437-441)
    max_cluster_ids: int = 16384 # centroid_prev table size (accel :188-193)


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout for spatio-temporal tiling."""

    tile_axis: str = "tile"      # spatial tiles over ICI
    data_axis: str = "data"      # time-window shards over hosts/DCN
    halo: int = 4                # eFAST needs a 4-px halo across tile borders
    # Tile-local NMS strip-exchange rounds (parallel/tiling.py). Suppression
    # information flows strictly left->right (tile-major candidate order);
    # round r gives each tile its left neighbor's strip as of round r-1, so
    # a deviation from the replicated greedy needs an unbroken suppression
    # chain spanning (rounds - 1) full tile widths. 2 == the r2 two-pass
    # scheme; n_tiles == exact fixpoint (tests/test_parallel.py adversarial
    # chain demonstrates both).
    nms_exchange_rounds: int = 2


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    sensor: SensorConfig = dataclasses.field(default_factory=SensorConfig)
    slicing: SliceConfig = dataclasses.field(default_factory=SliceConfig)
    dedup: DedupConfig = dataclasses.field(default_factory=DedupConfig)
    cluster: ClusterConfig = dataclasses.field(default_factory=ClusterConfig)
    kmeans: KMeansConfig = dataclasses.field(default_factory=KMeansConfig)
    efast: EFastConfig = dataclasses.field(default_factory=EFastConfig)
    nms: NMSConfig = dataclasses.field(default_factory=NMSConfig)
    tracker: TrackerConfig = dataclasses.field(default_factory=TrackerConfig)
    optics: OpticsConfig = dataclasses.field(default_factory=OpticsConfig)
    dbscan: DBSCANConfig = dataclasses.field(default_factory=DBSCANConfig)
    flow: FlowConfig = dataclasses.field(default_factory=FlowConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)


DEFAULT = EngineConfig()
