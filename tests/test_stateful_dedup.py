"""applyInPandasWithState custom stateful operator: cross-micro-batch
dedup must emit each doc_id exactly once even when duplicates arrive in
different micro-batches."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.stream import stateful_dedup_stream


@pytest.fixture()
def dup_dataset(tmp_path):
    """Two parquet files (= two micro-batches at maxFilesPerTrigger=1)
    sharing half their doc_ids."""
    pods = synth.gen_pods(seed=5)
    seq = synth.gen_sequences(200, pods, seed=5)
    d = tmp_path / "seq"
    os.makedirs(d)
    tbl = pa.Table.from_pandas(seq, schema=synth.SEQUENCES_ARROW_SCHEMA,
                               preserve_index=False)
    first = tbl.slice(0, 120)            # docs 0..119
    second = tbl.slice(60, 140)          # docs 60..199 (60..119 repeated)
    pq.write_table(first, str(d / "part-00000.parquet"))
    pq.write_table(second, str(d / "part-00001.parquet"))
    return str(d)


def test_cross_batch_dedup(spark, dup_dataset, tmp_path):
    cfg = PipelineConfig(
        input_path=dup_dataset,
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q = stateful_dedup_stream(spark, cfg, queryName="dedup_t1")
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id FROM dedup_t1").collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == 200               # 260 input rows, 60 dups dropped
    assert len(set(ids)) == 200


def test_state_ttl_eviction(spark, tmp_path):
    """The per-key state must EXPIRE (processing-time TTL): a key whose
    timeout fired is evicted — bounding total state to the keys of one
    TTL window — and a later duplicate of it is re-emitted (the
    documented TTL-dedup trade).  One live query throughout: eviction is
    observed via lastProgress state-row counts dropping to zero (Spark
    schedules timeout-draining batches on its own once timeouts are
    armed), then re-emission via the memory sink growing again."""
    import time

    pods = synth.gen_pods(seed=7)
    seq = synth.gen_sequences(50, pods, seed=7)
    tbl = pa.Table.from_pandas(seq, schema=synth.SEQUENCES_ARROW_SCHEMA,
                               preserve_index=False)
    d = tmp_path / "seq"
    os.makedirs(d)
    cfg = PipelineConfig(
        input_path=str(d),
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q = stateful_dedup_stream(spark, cfg, queryName="ttl_s", ttl_ms=2000,
                              continuous=True)
    try:
        def emitted():
            return [r["doc_id"]
                    for r in spark.sql("SELECT doc_id FROM ttl_s").collect()]

        def state_rows():
            p = q.lastProgress
            ops = (p or {}).get("stateOperators") or []
            return ops[0].get("numRowsTotal") if ops else None

        def wait_until(pred, what, timeout=120):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if pred():
                    return
                time.sleep(0.5)
            raise AssertionError(f"timed out waiting for {what}")

        pq.write_table(tbl, str(d / "f0.parquet"))
        wait_until(lambda: len(emitted()) == 50, "first emission")
        got1 = set(emitted())
        assert len(got1) == 50

        # TTL fires → all 50 keys evicted; state store drains to empty
        wait_until(lambda: state_rows() == 0, "state eviction")

        # same keys again: re-emitted because their state is gone (with
        # NoTimeout semantics this write would add 0 rows forever)
        pq.write_table(tbl, str(d / "f1.parquet"))
        wait_until(lambda: len(emitted()) == 100, "re-emission")
        ids = emitted()
        assert set(ids) == got1 and len(ids) == 100  # each key exactly twice
    finally:
        q.stop()
