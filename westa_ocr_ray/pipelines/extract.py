"""The flagship pipeline — the reference's whole dataflow
(app/worker.py:170-505) as one streaming Ray Data program:

    read(documents)
      → map_batches(explode_spans)            # doc → span rows (M1 fan-out)
      → [repartition(shuffle)]                # opt-in skew all-to-all (§4.2)
      → map_batches(prepare)                  # fetch + page split (S1/M1)
      → map_batches(ExtractModel, actor pool) # stateful model (A1) + masters (J1)
      → exchange on `part`                    # the one shuffle (O1 + G1):
          run_extract:     external staged shuffle + per-partition reduce
          extract_dataset: groupby(part).map_groups(reassemble)
      → [atomic per-partition write + markers + lineage]   # S3-S6, §4.4

Everything streams with backpressure; nothing materializes the corpus.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
from typing import Optional, Set

import ray.data as rd

from .. import fixtures
from ..config import ExtractConfig
from ..stages import ExtractModel, make_explode, make_part_reducer, make_prepare
from ..stages.reassemble import reassemble_partition


def read_documents(path: str, num_blocks: Optional[int] = None) -> rd.Dataset:
    """Input source: the interleaved documents table
    (BASELINE.json.input_hint schema) through the Lance/Parquet storage
    seam (storage.py; SURVEY.md §7)."""
    from ..storage import read_table

    return read_table(path, num_blocks=num_blocks)


def build_extracted_units(docs: rd.Dataset, cfg: ExtractConfig,
                          skip_parts: Optional[Set[int]] = None,
                          stage_dir: Optional[str] = None,
                          stage_fs=None) -> rd.Dataset:
    """documents → extracted unit rows (pre-reassembly).

    With ``stage_dir`` set, the extract actors also write the map side of
    the external shuffle and the returned dataset is the tiny manifest
    (see stages/staging.py); batches are whole blocks then, so each block
    yields one stage file."""
    ds = docs.map_batches(
        make_explode(cfg.num_parts, skip_parts, local_interleave=cfg.local_interleave),
        batch_format="pyarrow")
    if cfg.skew_repartition:
        # opt-in all-to-all on the tiny span-ref rows (no payloads yet):
        # shuffles metadata, not data — for inputs whose heavy docs are
        # clustered so badly that in-block interleave + dynamic batch
        # dispatch can't level the actor pool.
        ds = ds.repartition(cfg.repartition_blocks, shuffle=True)
    ds = ds.map_batches(make_prepare(cfg.seed), batch_format="pyarrow")
    # Broadcast small side (J1): the masters table is tiny, so it ships
    # inline in the actor-creation task (once per actor, never per batch).
    # A large small-side would go through ray.put with the ref kept alive
    # on the driver (see similarity.py for that pattern).
    masters = fixtures.master_keys(cfg.seed, cfg.pattern)
    return ds.map_batches(
        ExtractModel,
        fn_constructor_kwargs={"masters": masters, "stage_dir": stage_dir,
                               "chaos_crash_marker": cfg.chaos_crash_marker,
                               "stage_fs": stage_fs},
        batch_format="pyarrow",
        batch_size=None if stage_dir is not None else cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency,
        num_cpus=cfg.extract_num_cpus,
    )


def extract_dataset(docs: rd.Dataset, cfg: ExtractConfig = ExtractConfig()) -> rd.Dataset:
    """In-memory variant: returns the RESULT_SCHEMA dataset (no files)."""
    units = build_extracted_units(docs, cfg)
    return units.groupby("part").map_groups(reassemble_partition, batch_format="pyarrow")


def done_parts(out_dir: str) -> Set[int]:
    return {int(os.path.basename(p)[len("part-"):-len(".done")])
            for p in glob.glob(os.path.join(out_dir, "_markers", "part-*.done"))}


def _check_assign_version(out_dir: str, skip: Set[int]) -> Set[int]:
    """Markers are only meaningful under the doc→partition assignment
    rule that wrote them (stages/explode.ASSIGN_VERSION). A resume
    against markers from a DIFFERENT version would mix two partition
    meanings (docs silently dropped or doubled) — instead, wipe the
    stale outputs and restart from scratch. The version stamp is
    written next to the markers at first run."""
    from ..stages.explode import ASSIGN_VERSION

    vfile = os.path.join(out_dir, "_markers", "ASSIGN_VERSION")
    cur = str(ASSIGN_VERSION)
    stamped = None
    if os.path.exists(vfile):
        with open(vfile) as fh:
            stamped = fh.read().strip()
    if skip and stamped != cur:
        for sub in ("extracted", "units", "_markers", "lineage"):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        skip = set()
    os.makedirs(os.path.join(out_dir, "_markers"), exist_ok=True)
    if stamped != cur:
        with open(vfile, "w") as fh:
            fh.write(cur)
    return skip


def _fire_commit_hooks(out_dir: str, hook) -> int:
    """Deliver ``on_partition_commit`` callbacks: for every partition
    with a completion marker but no ``.notified`` stamp, call the hook
    with the marker dict (+ its lineage path), then stamp. The stamp is
    written AFTER the hook returns, so delivery is exactly-once per
    partition in normal operation and at-least-once across a crash
    inside the hook itself — the same semantics as the reference's
    per-page webhook push (app/worker.py:633-687), at the engine's
    partition-commit granularity."""
    fired = 0
    for p in sorted(glob.glob(os.path.join(out_dir, "_markers",
                                           "part-*.done"))):
        nfile = p[:-len(".done")] + ".notified"
        if os.path.exists(nfile):
            continue
        with open(p) as fh:
            marker = json.load(fh)
        marker["lineage_path"] = os.path.join(
            out_dir, "lineage", f"part-{int(marker['part']):05d}.jsonl")
        hook(marker)
        with open(nfile, "w") as fh:
            fh.write("ok")
        fired += 1
    return fired


def run_extract(input_path: str, out_dir: str,
                cfg: ExtractConfig = ExtractConfig(),
                on_partition_commit=None) -> dict:
    """Resumable run: skips partitions that already have completion
    markers (anti-join at the read — reference startup requeue,
    app/main.py:402-406, at output-partition granularity instead of
    whole-job), writes the rest atomically, and records run metrics.

    ``on_partition_commit``: optional callable fired once per committed
    partition with the marker dict (part, rows, spans, errors, wall_ms,
    attempt, lineage_path) — the push-notification seam (reference
    webhook analog). Unnotified partitions from a previous crashed run
    are delivered first; delivery state persists in
    ``_markers/part-*.notified`` so a re-run never re-fires.

    The doc_id exchange before reassembly is an external staged shuffle
    (see stages/reassemble.py): phase 1 streams extracted units into
    per-partition parquet fragments; phase 2 reduces each partition
    independently and commits it with its marker + lineage. Stage files
    from a crashed run are wiped — unfinished partitions recompute from
    the input (completed ones are skipped by their markers).

    Cooperative cancellation (``cfg.stop_file``, reference
    app/worker.py:188,256,303-310 + admin stop app/admin.py:727-782):
    when the stop file appears — touched externally, or by this
    function's own SIGTERM handler — the run DRAINS: the phase-1→2
    boundary and every phase-2 reducer check it, already-finished
    partitions commit normally with markers/lineage/hooks, nothing new
    starts, and the function returns metrics with ``stopped=True`` and
    ``parts_drained`` (exit 0). A later run without the stop file is a
    plain marker resume over exactly the drained partitions.

    Returns the run-metrics dict (also written to out_dir/metrics/)."""
    import signal
    import threading

    t0 = time.perf_counter()

    def stop_requested() -> bool:
        return cfg.stop_file is not None and os.path.exists(cfg.stop_file)

    prev_handler = None
    if cfg.stop_file is not None and threading.current_thread() is threading.main_thread():
        def _drain_on_term(signum, frame):
            with open(cfg.stop_file, "w") as fh:
                fh.write(f"SIGTERM pid={os.getpid()}\n")
        prev_handler = signal.signal(signal.SIGTERM, _drain_on_term)
    try:
        return _run_extract_inner(input_path, out_dir, cfg,
                                  on_partition_commit, t0, stop_requested)
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)


def _run_extract_inner(input_path: str, out_dir: str, cfg: ExtractConfig,
                       on_partition_commit, t0: float,
                       stop_requested) -> dict:
    skip = _check_assign_version(out_dir, done_parts(out_dir))
    attempt = cfg.attempt if cfg.attempt else (1 if skip else 0)
    if on_partition_commit is not None and skip:
        # partitions committed by a crashed earlier run whose hooks
        # never fired (or that ran without a hook)
        _fire_commit_hooks(out_dir, on_partition_commit)
    from ..stages.staging import resolve_stage_fs, wipe_stage_dir

    tag = hashlib.md5(os.path.abspath(out_dir).encode()).hexdigest()[:12]
    stage_fs = None
    if cfg.stage_root and "://" in cfg.stage_root:
        # shared/remote staging: resolve the filesystem ONCE here; the
        # fs object ships (pickled) into extract actors and reducers.
        # Multi-node REQUIRES this form (or a stage_root path mounted
        # identically on every node): phase 2 reads every stage file.
        stage_fs, stage_base = resolve_stage_fs(cfg.stage_root)
        stage_dir = stage_base.rstrip("/") + "/" + tag
    elif cfg.stage_root and os.path.isdir(os.path.dirname(cfg.stage_root.rstrip("/")) or "/"):
        stage_dir = os.path.join(cfg.stage_root, tag)
    else:
        stage_dir = os.path.join(out_dir, "_stage")
    wipe_stage_dir(stage_dir, fs=stage_fs)
    summary_rows = []
    phase1_sec = phase2_sec = 0.0
    n_remaining = cfg.num_parts - len(skip)
    if n_remaining and not stop_requested():
        docs = read_documents(input_path, num_blocks=cfg.read_num_blocks)
        # phase 1: map-side shuffle files, written by the extract actors
        # themselves (streams; no barrier, no extra worker pool)
        manifest = build_extracted_units(docs, cfg, skip_parts=skip,
                                         stage_dir=stage_dir,
                                         stage_fs=stage_fs)
        manifest = manifest.materialize()  # manifest is tiny (part, rows)
        phase1_sec = time.perf_counter() - t0
        os.makedirs(os.path.join(out_dir, "metrics"), exist_ok=True)
        with open(os.path.join(out_dir, "metrics",
                               f"stats-attempt{attempt}.txt"), "w") as fh:
            fh.write(manifest.stats())  # per-stage wall/cpu/memory breakdown
        # phase 2: one reduce per partition, embarrassingly parallel.
        # A stop request landing between the phases drains here — the
        # stage files are transient either way, so nothing is lost that
        # a marker resume would not recompute.
        remaining = sorted(set(range(cfg.num_parts)) - skip)
        if not stop_requested():
            parts_ds = rd.from_items([{"part": p} for p in remaining],
                                     parallelism=len(remaining))
            markers = parts_ds.map_batches(
                make_part_reducer(stage_dir, out_dir, attempt=attempt,
                                  keep_units=cfg.keep_units,
                                  stop_file=cfg.stop_file,
                                  stage_fs=stage_fs),
                batch_format="pyarrow", batch_size=1,
                concurrency=cfg.reduce_concurrency)
            summary_rows = markers.take_all()  # tiny: one row per partition
        phase2_sec = time.perf_counter() - t0 - phase1_sec
        wipe_stage_dir(stage_dir, fs=stage_fs)
        if on_partition_commit is not None:
            _fire_commit_hooks(out_dir, on_partition_commit)
    wall = time.perf_counter() - t0
    metrics = {
        "stopped": stop_requested(),
        "parts_drained": n_remaining - len(summary_rows),
        "input": input_path,
        "out_dir": out_dir,
        "attempt": attempt,
        "parts_skipped": len(skip),
        "parts_written": len(summary_rows),
        "docs": int(sum(r["docs"] for r in summary_rows)),
        "spans": int(sum(r["spans"] for r in summary_rows)),
        "errors": int(sum(r["errors"] for r in summary_rows)),
        "wall_sec": round(wall, 3),
        "phase1_sec": round(phase1_sec, 3),
        "phase2_sec": round(phase2_sec, 3),
        "num_parts": cfg.num_parts,
    }
    os.makedirs(os.path.join(out_dir, "metrics"), exist_ok=True)
    with open(os.path.join(out_dir, "metrics", f"run-attempt{attempt}.json"), "w") as fh:
        json.dump(metrics, fh, indent=2)
    return metrics


def read_extracted(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "extracted"))
