"""Per-run configuration — the engine analog of the reference's per-job
knobs (app/models.py:34-52) and env surface (app/settings.py:131-170),
collapsed to an immutable dataclass (no hot reload; Ray actor pools are
per-run, SURVEY.md §2.3 A3)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

from .fixtures import DEFAULT_SEED


@dataclass(frozen=True)
class ExtractConfig:
    seed: int = DEFAULT_SEED
    pattern: str = "A"              # masters pre-filter (GAS doc :57-70)
    num_parts: int = 64             # output partitions (resume granularity)
    # skew handling (SURVEY.md §4.2), two levels:
    # - local_interleave (default): deterministic pseudo-random reorder of
    #   span-ref rows WITHIN each explode batch — free, streaming, spreads
    #   heavy media spans across the actor pool's batch_size slices.
    # - skew_repartition (opt-in): a full shuffle of the tiny pre-payload
    #   span-ref rows across blocks. An all-to-all barrier: only worth it
    #   when heavy docs are pathologically clustered in the input files.
    local_interleave: bool = True
    skew_repartition: bool = False
    repartition_blocks: int = 64
    extract_batch_size: int = 128   # small batches keep heavy pages from stalling a worker
    extract_concurrency: Tuple[int, int] = (2, 12)  # actor-pool bounds
    extract_num_cpus: float = 1.0
    # staged-shuffle knobs: input block count controls stage-file count
    # (one stage file per block); the reduce is storage-bandwidth-bound
    # locally, so its task concurrency is capped independently of CPUs
    # (Ray still schedules <= available CPUs below the cap). 16 beat 8
    # at the 6M-doc rehearsal (phase2 15.2s -> 9.7s, BASELINE.md §10x);
    # 256 parts with 16 reducers regressed (32.3s — per-task stage-file
    # open cost dominates), so num_parts stays 64.
    read_num_blocks: Optional[int] = None
    reduce_concurrency: int = 16
    # stage files are transient (wiped on resume): put them on fast local
    # scratch — /dev/shm when available, the cluster-node SSD otherwise.
    # MULTI-NODE: phase 2 requires every reducer to see every stage
    # file, so stage_root must then be EITHER a path mounted identically
    # on all nodes OR a filesystem URI ("file:///mnt/shared/stage",
    # "s3://bucket/stage", any staging.register_stage_fs scheme) — the
    # URI resolves once on the driver to a pyarrow.fs.FileSystem that
    # ships into the actors/reducers (stages/staging.py). Codec
    # auto-switches to zstd on URI staging (network bytes dominate;
    # scripts/stage_codec_sweep.py).
    stage_root: Optional[str] = "/dev/shm/westa_stage"
    # also persist per-unit rows (units/part-*.parquet) — the reference's
    # per-page PAGE_RESULT event granularity (app/worker.py:633-687)
    keep_units: bool = False
    attempt: int = 0                # bumped by resume runs (lineage)
    # cooperative cancellation (reference worker.py:188,256,303-310:
    # stop-signal checks between pages/jobs; admin stop app/admin.py:
    # 727-782). When this file exists the run DRAINS instead of dying:
    # phase boundaries and each phase-2 reducer check it, finished
    # partitions commit with their markers, the rest are left for a
    # normal marker resume, and run_extract returns (exit 0) with
    # metrics["stopped"]=True. run_extract also traps SIGTERM into
    # touching this file, so `ray job stop` style termination drains
    # too. Multi-node: the path must be on storage every reducer sees
    # (same requirement as stage_root).
    stop_file: Optional[str] = None
    # fault-injection seam (tests/test_chaos.py): when set, the FIRST
    # extract actor to process a batch hard-kills its process (os._exit)
    # after creating this marker file — proving Ray's task-retry
    # boundary leaves output byte-identical. None in production.
    chaos_crash_marker: Optional[str] = None
