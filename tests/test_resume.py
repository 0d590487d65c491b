"""Resume semantics (SURVEY.md §5.2.4): a run that completed only K of P
partitions resumes without reprocessing them, and the resumed output
equals an uninterrupted run."""

import glob
import json
import os
import shutil

import pyarrow.compute as pc

from westa_ocr_ray import fixtures
from westa_ocr_ray.config import ExtractConfig
from westa_ocr_ray.pipelines.extract import (
    done_parts, read_extracted, run_extract)

CFG = ExtractConfig(num_parts=8, repartition_blocks=8, extract_concurrency=(1, 3))


def _result_key(ds):
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    return [(r["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["order"])
                           for s in r["spans"]], r["status"]) for r in rows]


def test_resume_skips_completed_partitions(tmp_path):
    corpus = fixtures.ensure_corpus("smoke")
    full_dir = str(tmp_path / "full")
    m_full = run_extract(corpus, full_dir, CFG)
    assert m_full["parts_written"] >= 1 and m_full["parts_skipped"] == 0
    full = _result_key(read_extracted(full_dir))

    # simulate a killed run: keep only K completed partitions
    killed_dir = str(tmp_path / "killed")
    shutil.copytree(full_dir, killed_dir)
    markers = sorted(glob.glob(os.path.join(killed_dir, "_markers", "*.done")))
    keep = 3
    for m in markers[keep:]:
        part = os.path.basename(m)[len("part-"):-len(".done")]
        os.remove(m)
        os.remove(os.path.join(killed_dir, "extracted", f"part-{part}.parquet"))
    assert len(done_parts(killed_dir)) == keep

    m_resume = run_extract(corpus, killed_dir, CFG)
    assert m_resume["parts_skipped"] == keep
    # resumed output identical to the uninterrupted run
    assert _result_key(read_extracted(killed_dir)) == full
    # lineage records the resumed partitions with attempt > 0
    attempts = set()
    for path in glob.glob(os.path.join(killed_dir, "lineage", "*.jsonl")):
        with open(path) as fh:
            for line in fh:
                attempts.add(json.loads(line)["attempt"])
    assert 1 in attempts and 0 in attempts


def test_assign_version_mismatch_restarts(tmp_path):
    """Markers written under a DIFFERENT doc→partition assignment
    version must not be trusted: the resume wipes the stale outputs
    and recomputes everything (mixing two partition meanings would
    silently drop or double docs)."""
    corpus = fixtures.ensure_corpus("smoke")
    out = str(tmp_path / "v")
    run_extract(corpus, out, CFG)
    full = _result_key(read_extracted(out))

    # forge an older-version partial run: rewrite the stamp and drop one
    # partition's marker + parquet
    with open(os.path.join(out, "_markers", "ASSIGN_VERSION"), "w") as fh:
        fh.write("1")
    m = sorted(glob.glob(os.path.join(out, "_markers", "*.done")))[0]
    part = os.path.basename(m)[len("part-"):-len(".done")]
    os.remove(m)
    os.remove(os.path.join(out, "extracted", f"part-{part}.parquet"))

    metrics = run_extract(corpus, out, CFG)
    assert metrics["parts_skipped"] == 0  # nothing trusted
    assert metrics["parts_written"] == CFG.num_parts
    assert _result_key(read_extracted(out)) == full
    with open(os.path.join(out, "_markers", "ASSIGN_VERSION")) as fh:
        from westa_ocr_ray.stages.explode import ASSIGN_VERSION
        assert fh.read().strip() == str(ASSIGN_VERSION)


def test_real_sigkill_resume(tmp_path):
    """Kill -9 an actual run mid-flight (its own Ray cluster, own process
    group), then resume in this session: the final output must equal an
    uninterrupted run — whatever partial state the kill left behind."""
    import signal
    import subprocess
    import sys
    import time as _time

    corpus = fixtures.ensure_corpus("correctness")
    out = str(tmp_path / "killed")
    script = (
        "import ray\n"
        "ray.init(address='local', num_cpus=4, include_dashboard=False,"
        " logging_level='ERROR')\n"
        "from westa_ocr_ray.config import ExtractConfig\n"
        "from westa_ocr_ray.pipelines.extract import run_extract\n"
        f"cfg = ExtractConfig(num_parts=16, extract_concurrency=(2, 2),"
        f" stage_root=None)\n"
        f"run_extract({corpus!r}, {out!r}, cfg)\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", script],
                            cwd="/root/repo", start_new_session=True,
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    _time.sleep(12)  # mid-flight: ray up, phase 1 running (2-actor pool is slow)
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()

    done_before = len(done_parts(out))
    cfg = ExtractConfig(num_parts=16, extract_concurrency=(1, 3), stage_root=None)
    m = run_extract(corpus, out, cfg)
    assert m["parts_skipped"] == done_before
    assert len(done_parts(out)) == 16

    clean = str(tmp_path / "clean")
    run_extract(corpus, clean, cfg)
    assert _result_key(read_extracted(out)) == _result_key(read_extracted(clean))


def test_on_partition_commit_fires_exactly_once_across_resume(tmp_path):
    """The push-notification seam (reference per-page webhook analog):
    on_partition_commit fires exactly once per partition across a
    killed run + resume + redundant re-run — unnotified partitions
    from the crashed run are delivered first, .notified stamps stop
    re-delivery, and every delivery carries the marker + lineage path."""
    corpus = fixtures.ensure_corpus("smoke")
    out = str(tmp_path / "out")

    # a run that committed 3 partitions and died before any hook fired
    run_extract(corpus, out, CFG)
    markers = sorted(glob.glob(os.path.join(out, "_markers", "*.done")))
    for m in markers[3:]:
        part = os.path.basename(m)[len("part-"):-len(".done")]
        os.remove(m)
        os.remove(os.path.join(out, "extracted", f"part-{part}.parquet"))

    fired = []
    hook = fired.append
    m = run_extract(corpus, out, CFG, on_partition_commit=hook)
    assert m["parts_skipped"] == 3
    parts = [r["part"] for r in fired]
    assert sorted(parts) == list(range(CFG.num_parts))  # every part once
    assert all("lineage_path" in r and os.path.exists(r["lineage_path"])
               and r["rows"] >= 0 for r in fired)

    # redundant re-run: everything already notified → zero deliveries
    m2 = run_extract(corpus, out, CFG, on_partition_commit=hook)
    assert m2["parts_written"] == 0
    assert len(fired) == CFG.num_parts


def test_noop_resume_when_all_done(tmp_path):
    corpus = fixtures.ensure_corpus("smoke")
    out = str(tmp_path / "out")
    run_extract(corpus, out, CFG)
    m = run_extract(corpus, out, CFG)
    assert m["parts_written"] == 0
    assert m["parts_skipped"] == len(done_parts(out))


def test_keep_units_writes_page_granularity(tmp_path):
    """--keep-units persists the per-unit rows (PAGE_RESULT analog)."""
    import pyarrow.dataset as pads

    corpus = fixtures.ensure_corpus("smoke")
    out = str(tmp_path / "out")
    cfg = ExtractConfig(num_parts=8, extract_concurrency=(1, 3), keep_units=True)
    m = run_extract(corpus, out, cfg)
    units = pads.dataset(os.path.join(out, "units")).to_table()
    assert {"doc_id", "span_idx", "page_idx", "kind", "text",
            "is_content", "error"} <= set(units.schema.names)
    # every unit the reducers consumed is persisted
    lineage_units = 0
    for p in glob.glob(os.path.join(out, "lineage", "*.jsonl")):
        with open(p) as fh:
            for line in fh:
                lineage_units += json.loads(line)["units_in"]
    assert units.num_rows == lineage_units
    assert m["docs"] == len(set(units.column("doc_id").to_pylist()))


def test_resume_ignores_stale_stage_files(tmp_path):
    """A run killed mid-phase-1 leaves partial stage files; the resume
    must wipe them and recompute unfinished partitions from the input."""
    corpus = fixtures.ensure_corpus("smoke")
    full_dir = str(tmp_path / "full")
    run_extract(corpus, full_dir, CFG)
    full = _result_key(read_extracted(full_dir))

    crashed = str(tmp_path / "crashed")
    os.makedirs(os.path.join(crashed, "_stage"), exist_ok=True)
    # garbage from a dead phase-1 (wrong schema, partial write)
    with open(os.path.join(crashed, "_stage", "dead.parquet"), "wb") as fh:
        fh.write(b"PAR1 garbage not a real file")
    cfg = ExtractConfig(num_parts=8, repartition_blocks=8,
                        extract_concurrency=(1, 3), stage_root=None)
    m = run_extract(corpus, crashed, cfg)
    assert m["parts_written"] == 8
    assert _result_key(read_extracted(crashed)) == full


def test_standalone_stage_writer_roundtrip(tmp_path):
    """stage_write_table: rows sorted by part into per-partition row
    groups; statistics-pruned read returns exactly one partition."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from westa_ocr_ray.stages.staging import stage_write_table

    t = pa.table({"part": pa.array([2, 0, 1, 0, 2], type=pa.int32()),
                  "v": pa.array([20, 0, 10, 1, 21], type=pa.int64())})
    stage = str(tmp_path / "stage")
    manifest = stage_write_table(t, stage)
    assert manifest.column("part").to_pylist() == [0, 1, 2]
    assert manifest.column("rows").to_pylist() == [2, 1, 2]
    got = pads.dataset(stage).to_table(filter=pads.field("part") == 0,
                                       use_threads=False)
    assert sorted(got.column("v").to_pylist()) == [0, 1]


def test_markers_match_partition_files(tmp_path):
    corpus = fixtures.ensure_corpus("smoke")
    out = str(tmp_path / "out")
    run_extract(corpus, out, CFG)
    ds = read_extracted(out)
    total_docs = ds.count()
    marker_docs = 0
    for m in glob.glob(os.path.join(out, "_markers", "*.done")):
        with open(m) as fh:
            marker_docs += json.load(fh)["rows"]
    assert marker_docs == total_docs


def test_graceful_drain_stop_file_mid_phase2(tmp_path):
    """Cooperative cancellation (VERDICT r4 item 2): the stop file
    appears mid-phase-2; the run commits the partitions it finished,
    exits normally with stopped=True, and a plain re-run completes the
    drained rest — final output identical to an uninterrupted run,
    attempt counts proving no committed partition was recomputed."""
    import threading

    corpus = fixtures.ensure_corpus("smoke")
    full_dir = str(tmp_path / "full")
    run_extract(corpus, full_dir, CFG)
    full = _result_key(read_extracted(full_dir))

    out = str(tmp_path / "drained")
    stop = str(tmp_path / "STOP")
    # serialize phase 2 so the marker watcher can interleave a stop
    cfg = ExtractConfig(num_parts=8, repartition_blocks=8,
                        extract_concurrency=(1, 3), reduce_concurrency=1,
                        stop_file=stop)

    def watch():
        while len(done_parts(out)) < 2:
            pass
        with open(stop, "w") as fh:
            fh.write("drain")

    w = threading.Thread(target=watch, daemon=True)
    w.start()
    m1 = run_extract(corpus, out, cfg)
    w.join(timeout=60)
    assert m1["stopped"] is True
    committed = len(done_parts(out))
    assert m1["parts_written"] == committed
    assert m1["parts_drained"] == 8 - committed
    assert 0 < committed < 8  # really drained mid-phase-2
    # markers exist ONLY for committed partitions; data files match
    assert committed == len(
        glob.glob(os.path.join(out, "extracted", "part-*.parquet")))

    # resume without the stop file: only the drained parts recompute
    os.remove(stop)
    m2 = run_extract(corpus, out, cfg)
    assert m2["stopped"] is False
    assert m2["parts_skipped"] == committed
    assert m2["parts_written"] == 8 - committed
    assert _result_key(read_extracted(out)) == full
    # attempt counts: committed parts carry attempt 0 only; drained
    # parts carry exactly one lineage line (attempt 1)
    for path in glob.glob(os.path.join(out, "lineage", "*.jsonl")):
        with open(path) as fh:
            lines = [json.loads(line) for line in fh]
        assert len(lines) == 1
        assert lines[0]["attempt"] in (0, 1)


def test_graceful_drain_sigterm(tmp_path):
    """SIGTERM during phase 2 is trapped into the stop file: the run
    drains (commits finished partitions, returns stopped=True) instead
    of dying — then resumes to the identical full output."""
    import signal
    import threading

    corpus = fixtures.ensure_corpus("smoke")
    out = str(tmp_path / "term")
    stop = str(tmp_path / "STOP_TERM")
    cfg = ExtractConfig(num_parts=8, repartition_blocks=8,
                        extract_concurrency=(1, 3), reduce_concurrency=1,
                        stop_file=stop)

    def watch():
        while len(done_parts(out)) < 2:
            pass
        signal.raise_signal(signal.SIGTERM)  # handler runs in main thread

    before = signal.getsignal(signal.SIGTERM)  # ray's own handler
    w = threading.Thread(target=watch, daemon=True)
    w.start()
    m1 = run_extract(corpus, out, cfg)  # main thread: handler fires here
    w.join(timeout=60)
    assert m1["stopped"] is True and os.path.exists(stop)
    assert 0 < m1["parts_written"] < 8
    # the pre-run handler was restored after the run
    assert signal.getsignal(signal.SIGTERM) is before

    os.remove(stop)
    m2 = run_extract(corpus, out, cfg)
    assert m2["parts_skipped"] == m1["parts_written"]
    full_dir = str(tmp_path / "full2")
    run_extract(corpus, full_dir, CFG)
    assert _result_key(read_extracted(out)) == _result_key(
        read_extracted(full_dir))


def test_stop_file_at_entry_noop(tmp_path):
    """A pre-existing stop file means the run does nothing at all —
    and a marker resume later picks up the whole job."""
    corpus = fixtures.ensure_corpus("smoke")
    out = str(tmp_path / "pre")
    stop = str(tmp_path / "PRE_STOP")
    with open(stop, "w") as fh:
        fh.write("stop")
    cfg = ExtractConfig(num_parts=8, repartition_blocks=8,
                        extract_concurrency=(1, 3), stop_file=stop)
    m = run_extract(corpus, out, cfg)
    assert m["stopped"] is True and m["parts_written"] == 0
    assert m["parts_drained"] == 8
    assert not os.path.exists(os.path.join(out, "extracted"))
    os.remove(stop)
    m2 = run_extract(corpus, out, cfg)
    assert m2["parts_written"] == 8 and m2["stopped"] is False


def test_run_extract_stage_root_file_uri(tmp_path):
    """stage_root as a pyarrow.fs URI (VERDICT r4 item 3): the whole
    external shuffle — write, list, pruned read, wipe — runs through
    FileSystem.from_uri, standing in for shared cluster storage. Output
    must be identical to default (/dev/shm) staging, and the stage base
    dir must actually have been used (created under the URI root, tag
    subdir wiped after the run)."""
    corpus = fixtures.ensure_corpus("smoke")
    base = str(tmp_path / "shared_stage")
    cfg = ExtractConfig(num_parts=8, repartition_blocks=8,
                        extract_concurrency=(1, 3),
                        stage_root=f"file://{base}")
    out = str(tmp_path / "uri_out")
    m = run_extract(corpus, out, cfg)
    assert m["parts_written"] == 8 and m["errors"] >= 0

    ref_out = str(tmp_path / "ref_out")
    run_extract(corpus, ref_out, CFG)
    assert _result_key(read_extracted(out)) == _result_key(
        read_extracted(ref_out))
    # the URI root was really the staging target: base dir created by
    # the stage writers, per-run tag subdir wiped on completion
    assert os.path.isdir(base) and os.listdir(base) == []


def test_run_extract_stage_on_rooted_filesystem(tmp_path):
    """stage_root through a REGISTERED scheme resolving to a
    SubTreeFileSystem (a rooted fs standing in for a shared mount):
    stage paths are subtree-relative, so any stage IO that bypassed the
    pyarrow.fs seam (raw os/shutil calls) would miss the root and
    corrupt or fail the run. Full run_extract + resume parity."""
    import pyarrow.fs as pafs

    from westa_ocr_ray.stages import staging

    corpus = fixtures.ensure_corpus("smoke")
    root = tmp_path / "mnt"
    root.mkdir()
    staging.register_stage_fs(
        "sharedtest",
        lambda uri: (pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem()),
                     uri.split("://", 1)[1]))
    try:
        cfg = ExtractConfig(num_parts=8, repartition_blocks=8,
                            extract_concurrency=(1, 3),
                            stage_root="sharedtest://stage")
        out = str(tmp_path / "subtree_out")
        m = run_extract(corpus, out, cfg)
        assert m["parts_written"] == 8
        # staging really landed under the subtree root
        assert os.path.isdir(root / "stage")

        ref_out = str(tmp_path / "ref_out2")
        run_extract(corpus, ref_out, CFG)
        assert _result_key(read_extracted(out)) == _result_key(
            read_extracted(ref_out))
    finally:
        staging._FS_FACTORIES.pop("sharedtest", None)


def test_stage_write_list_read_roundtrip_on_fs(tmp_path):
    """Unit-level seam check: stage_write_table / list_stage_files /
    wipe_stage_dir through an explicit filesystem give byte-identical
    tables to the os fast path, dot-tmp files stay invisible, and the
    URI default codec is zstd."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.fs as pafs

    from westa_ocr_ray.stages import staging

    t = pa.table({"part": pa.array([1, 0, 1, 2], type=pa.int32()),
                  "doc_id": ["a", "b", "c", "d"],
                  "payload": [b"x" * 10, b"y", b"z", b"w"]})
    local_dir = str(tmp_path / "local")
    man_local = staging.stage_write_table(t, local_dir)

    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    man_fs = staging.stage_write_table(t, "fsstage", fs=fs)
    assert man_local.equals(man_fs)

    files = staging.list_stage_files("fsstage", fs=fs)
    assert len(files) == 1 and not os.path.basename(files[0]).startswith(".")
    got = pads.dataset(files, format="parquet", filesystem=fs).to_table()
    exp = pads.dataset(staging.list_stage_files(local_dir)).to_table()
    # same rows (both part-sorted by the stable stage sort)
    assert got.equals(exp)
    # URI/fs staging defaults to zstd (network codec)
    import pyarrow.parquet as pq_
    meta = pq_.ParquetFile(str(tmp_path / "fsstage" / os.path.basename(files[0]))).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"
    # one row group per partition for statistics pruning
    assert meta.num_row_groups == 3

    staging.wipe_stage_dir("fsstage", fs=fs)
    assert staging.list_stage_files("fsstage", fs=fs) == []
    staging.wipe_stage_dir("fsstage", fs=fs)  # idempotent on missing
