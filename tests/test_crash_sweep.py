"""Exhaustive crash-point sweep over the table-commit protocols: inject
a crash after EVERY k-th committer put during a batch compaction and a
cross-batch consolidation, then recover and re-run — at every crash
point the reader must see exactly the original rows (never a mix, never
doubles), and the retried operation must converge.  This is the
brute-force version of the hand-picked crash-window tests: it does not
require knowing where the windows are."""

import os

import pytest

from logfowd2_spark import synth
from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.commit import get_committer
from logfowd2_spark.streaming.maintenance import (
    compact_batch,
    compact_table,
    committed_batch_ids,
    recover_compactions,
)
from logfowd2_spark.streaming.pipeline import read_routed, run_pipeline


class SimulatedCrash(Exception):
    pass


class CrashingCommitter:
    """Delegates to a real committer but raises after N put_file calls
    (the atomic publish primitive both protocols and the manifest layer
    share — every commit step goes through it)."""

    def __init__(self, inner, crash_after: int):
        self.inner = inner
        self.remaining = crash_after

    def put_file(self, *a, **kw):
        if self.remaining <= 0:
            raise SimulatedCrash()
        self.remaining -= 1
        return self.inner.put_file(*a, **kw)

    def __getattr__(self, name):
        return getattr(self.inner, name)


def _counts(spark, cfg):
    return {
        r["batch_id"]: r["n"]
        for r in read_routed(spark, cfg).groupBy("batch_id").count()
        .withColumnRenamed("count", "n").collect()
    }


@pytest.fixture(scope="module", params=["rename", "put"])
def ran(request, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"crashsweep-{request.param}")
    paths = synth.write_dataset(str(d / "in"), n_rows=400, seed=47,
                                n_files=2)
    cfg = PipelineConfig(
        input_path=paths["sequences"],
        output_path=str(d / "out"),
        checkpoint_path=str(d / "ckpt"),
        bulk_size=40,
        commit_protocol=request.param,
    )
    run_pipeline(spark, cfg, paths["pods"], paths["routes"],
                 files_per_batch=1)
    return cfg


def _sweep(spark, cfg, op, monkeypatch, max_points: int = 40):
    """Run ``op`` with a crash after k puts for k = 0, 1, 2, ... until
    a run completes without crashing; after each crash verify reads and
    recovery, and after each recovery retry verify convergence."""
    import logfowd2_spark.streaming.commit as commit_mod

    baseline = _counts(spark, cfg)
    real_get = get_committer
    completed = False
    for k in range(max_points):
        crashing = {"committer": None}

        def fake_get(protocol, _k=k):
            c = CrashingCommitter(real_get(protocol), _k)
            crashing["committer"] = c
            return c

        monkeypatch.setattr(commit_mod, "get_committer", fake_get)
        # the modules import get_committer lazily FROM commit, so the
        # patch takes effect at every call site
        try:
            op()
        except SimulatedCrash:
            monkeypatch.setattr(commit_mod, "get_committer", real_get)
            # crash window k: reads must still be exact
            assert _counts(spark, cfg) == baseline, \
                f"reads wrong in crash window after {k} puts"
            recover_compactions(cfg)
            assert _counts(spark, cfg) == baseline, \
                f"reads wrong after recovery at crash point {k}"
            continue
        monkeypatch.setattr(commit_mod, "get_committer", real_get)
        completed = True
        break
    assert completed, "op never completed within the sweep budget"
    # the completed retry converged: rows identical, and a plain re-run
    # is a no-op that leaves them identical
    assert _counts(spark, cfg) == baseline
    op()
    assert _counts(spark, cfg) == baseline


def test_compact_batch_survives_every_crash_point(spark, ran, monkeypatch):
    cfg = ran
    b = committed_batch_ids(cfg)[0]

    def op():
        compact_batch(spark, cfg, b, target_records_per_file=10_000)

    _sweep(spark, cfg, op, monkeypatch)


def test_compact_table_survives_every_crash_point(spark, ran, monkeypatch):
    cfg = ran

    def op():
        compact_table(spark, cfg, target_records_per_file=10_000)

    _sweep(spark, cfg, op, monkeypatch)
