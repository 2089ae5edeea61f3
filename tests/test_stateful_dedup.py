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
