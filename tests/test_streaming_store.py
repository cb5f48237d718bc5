"""Streaming sink → TableStore: exactly-once + crash-recovery proof.

The reference's transactional guarantee is "commit per period, resume
from the sink tip" (/root/reference/app/main.py:379, app/db/
postgres.py:280-312). The Spark form: ``foreachBatch`` with a
checkpoint gives replay-with-same-batch-id, and TableStore's
commit-partition writes make the replay idempotent. These tests prove
the three behaviors that make that exactly-once: (1) each batch lands
once, (2) restarting from the checkpoint reprocesses nothing, (3) a
re-delivered batch overwrites its own partition instead of appending."""

from __future__ import annotations

import os
import shutil

import pytest

from pantasia_db_sync_spark.pipeline.store import TableStore
from pantasia_db_sync_spark.streaming import events_stream, foreach_batch_sync

N_FILES = 2


@pytest.fixture()
def dirs(tmp_path, sf_dir):
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    src = os.path.join(sf_dir, "events.parquet")
    for i in range(N_FILES):
        shutil.copy(src, stream_dir / f"part-{i}.parquet")
    return str(stream_dir), str(tmp_path / "ckpt"), str(tmp_path / "store"), src


def _run(spark, stream_dir, ckpt, store):
    def writer(df, batch_id):
        store.append("events_sink", df, commit_id=batch_id)
        store.commit_append("events_sink", batch_id)

    q = foreach_batch_sync(
        events_stream(spark, stream_dir, max_files_per_trigger=1),
        checkpoint_dir=ckpt,
        batch_writer=writer,
        available_now=True,
    )
    q.awaitTermination(300)


def test_exactly_once_and_restart(spark, dirs):
    stream_dir, ckpt, store_dir, src = dirs
    store = TableStore(store_dir)
    n_file = spark.read.parquet(src).count()

    _run(spark, stream_dir, ckpt, store)
    sink = store.read_facts(spark, "events_sink")
    assert sink.count() == N_FILES * n_file  # (1) each batch exactly once

    # (2) restart with the same checkpoint: nothing reprocessed
    _run(spark, stream_dir, ckpt, store)
    assert store.read_facts(spark, "events_sink").count() == N_FILES * n_file

    # new data arriving after restart IS processed (tip resume, G1)
    shutil.copy(src, os.path.join(stream_dir, f"part-{N_FILES}.parquet"))
    _run(spark, stream_dir, ckpt, store)
    assert store.read_facts(spark, "events_sink").count() == (N_FILES + 1) * n_file


def test_redelivered_batch_is_idempotent(spark, dirs):
    """(3) crash-between-write-and-checkpoint: the batch re-delivers
    with the SAME batch_id; the commit partition is overwritten in
    place, so the committed row count never double-counts."""
    stream_dir, ckpt, store_dir, src = dirs
    store = TableStore(store_dir)
    n_file = spark.read.parquet(src).count()
    _run(spark, stream_dir, ckpt, store)
    before = store.read_facts(spark, "events_sink").count()

    redelivered = spark.read.parquet(os.path.join(stream_dir, "part-0.parquet"))
    store.append("events_sink", redelivered, commit_id=0)  # same id again
    store.commit_append("events_sink", store.current_version("events_sink"))
    assert store.read_facts(spark, "events_sink").count() == before
    assert before == N_FILES * n_file


def test_poll_backoff_processing_time_trigger(spark, dirs):
    """G3: the reference's poll/backoff loop (app/main.py:48-53) maps to
    the processingTime trigger — batches fire on the cadence, late-added
    files are picked up by a later tick, and stop() is graceful."""
    import time

    stream_dir, ckpt, store_dir, src = dirs
    store = TableStore(store_dir)
    n_file = spark.read.parquet(src).count()

    def writer(df, batch_id):
        store.append("events_sink", df, commit_id=batch_id)
        store.commit_append("events_sink", batch_id)

    q = foreach_batch_sync(
        events_stream(spark, stream_dir, max_files_per_trigger=10),
        checkpoint_dir=ckpt,
        batch_writer=writer,
        processing_time="1 seconds",
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            df = store.read_facts(spark, "events_sink")
            if df is not None and df.count() >= N_FILES * n_file:
                break
            time.sleep(1)
        assert store.read_facts(spark, "events_sink").count() == N_FILES * n_file

        # a file arriving AFTER the stream started is polled in on a
        # later trigger tick — the backoff-poll semantics
        shutil.copy(src, os.path.join(stream_dir, "part-late.parquet"))
        deadline = time.time() + 120
        while time.time() < deadline:
            if store.read_facts(spark, "events_sink").count() >= (N_FILES + 1) * n_file:
                break
            time.sleep(1)
        assert (
            store.read_facts(spark, "events_sink").count() == (N_FILES + 1) * n_file
        )
    finally:
        q.stop()
