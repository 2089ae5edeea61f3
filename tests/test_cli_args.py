"""CLI argument-surface contract (``__main__.main``): the ingest stage
needs ``--pods``/``--routes`` (reference ``main()`` wiring,
src/main.rs:61-192), while table-maintenance flags (compaction /
deletes / merge / vacuum) must be invocable standalone against an
already-committed table.  Every case here fails argument validation
BEFORE a SparkSession is built, so the test is sub-second."""

import pytest

from logfowd2_spark.__main__ import main


def _err(argv):
    with pytest.raises(SystemExit) as e:
        main(argv)
    assert e.value.code == 2


def test_no_flags_rejected():
    _err([])


def test_output_checkpoint_without_stage_rejected():
    # neither ingest inputs nor a maintenance flag: nothing to do
    _err(["--output", "/tmp/x", "--checkpoint", "/tmp/y"])


def test_pods_without_routes_rejected():
    _err(["--pods", "/tmp/p", "--input", "/tmp/i",
          "--output", "/tmp/x", "--checkpoint", "/tmp/y"])


def test_ingest_requires_input():
    _err(["--pods", "/tmp/p", "--routes", "/tmp/r",
          "--output", "/tmp/x", "--checkpoint", "/tmp/y"])


def test_redrive_requires_pods():
    _err(["--redrive", "2", "--compact-table",
          "--output", "/tmp/x", "--checkpoint", "/tmp/y"])


def test_maintenance_requires_output_and_checkpoint():
    _err(["--merge-from", "/tmp/u.parquet"])


def test_deliver_wants_group_and_dest():
    _err(["--deliver", "groupnodest",
          "--output", "/tmp/x", "--checkpoint", "/tmp/y"])


def test_consumer_lag_standalone_skips_spark(tmp_path, capsys):
    # metadata-only ops poll: no JVM, answers instantly on an empty log
    import json

    rc = main(["--consumer-lag", "g",
               "--output", str(tmp_path / "out"),
               "--checkpoint", str(tmp_path / "ckpt")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["consumer_lag"]["batches_behind"] == 0
