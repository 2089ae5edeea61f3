"""Config validation tests (≈ reference settings.rs:131-260 rules)."""

import json

import pytest

from logfowd2_spark.config import PipelineConfig


def test_defaults_valid():
    PipelineConfig().validate()


@pytest.mark.parametrize(
    "kw",
    [
        {"max_line_size": 0},
        {"bulk_size": 0},                 # settings.rs:194-196
        {"index_name": ""},               # settings.rs:169-192
        {"index_name": "-leading-dash"},
        {"index_name": "UPPER"},
        {"index_name": "has space"},
        {"write_salt_buckets": 0},
        {"routes": []},
    ],
)
def test_invalid_rejected(kw):
    with pytest.raises(ValueError):
        PipelineConfig(**kw).validate()


def test_resolve_codec(monkeypatch):
    """codec='auto' picks arrow only with ~2 free host cores per task
    slot; explicit codecs pass through; probe failure degrades to jvm."""
    import logfowd2_spark.config as cfgmod

    assert cfgmod.resolve_codec("jvm", 4) == "jvm"
    assert cfgmod.resolve_codec("arrow", 64) == "arrow"
    monkeypatch.setattr(cfgmod.os, "cpu_count", lambda: 32)
    monkeypatch.setattr(cfgmod.os, "getloadavg", lambda: (1.0, 0.0, 0.0))
    assert cfgmod.resolve_codec("auto", 8) == "arrow"    # 31 free >= 16
    assert cfgmod.resolve_codec("auto", 32) == "jvm"     # 31 free < 64
    monkeypatch.setattr(cfgmod.os, "getloadavg", lambda: (20.0, 0.0, 0.0))
    assert cfgmod.resolve_codec("auto", 8) == "jvm"      # 12 free < 16

    def boom():
        raise OSError("no loadavg on this platform")

    monkeypatch.setattr(cfgmod.os, "getloadavg", boom)
    assert cfgmod.resolve_codec("auto", 1) == "jvm"


def test_invalid_codec_rejected():
    with pytest.raises(ValueError):
        PipelineConfig(codec="nope").validate()


def test_load_from_json(tmp_path, monkeypatch):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"max_line_size": 512, "index_name": "logs"}))
    cfg = PipelineConfig.load(str(p))
    assert cfg.max_line_size == 512
    # CFG_PATH env override (settings.rs:116)
    monkeypatch.setenv("CFG_PATH", str(p))
    assert PipelineConfig.load().max_line_size == 512


def test_runtime_gauges_ema_and_adaptive_timeout():
    """A6 parity: EMA smoothing is the reference's exact formula
    (0.9*old + 0.1*new, pool.rs:63-82) seeded with the first sample, and
    the adaptive timeout scales by failure streak (x1/x1.5/x2, capped at
    120 s, pool.rs:94-121) with a 3x-EMA floor for slow-healthy sinks."""
    from logfowd2_spark.streaming.metrics import RuntimeGauges

    g = RuntimeGauges()
    g.observe(1000.0)
    assert g.ema_batch_ms == 1000.0          # first sample seeds
    g.observe(2000.0)
    assert g.ema_batch_ms == 0.9 * 1000.0 + 0.1 * 2000.0
    assert g.consecutive_failures == 0
    assert g.adaptive_timeout_ms() == 30_000.0

    g.observe(1000.0, failed=True)
    assert g.consecutive_failures == 1
    assert g.adaptive_timeout_ms() == 45_000.0      # x1.5 streak 1-2
    g.observe(1000.0, failed=True)
    g.observe(1000.0, failed=True)
    assert g.consecutive_failures == 3
    assert g.adaptive_timeout_ms() == 60_000.0      # x2 streak >2
    g.observe(1000.0)                               # success resets
    assert g.consecutive_failures == 0

    # slow-but-healthy: timeout never below 3x observed EMA, capped
    g2 = RuntimeGauges()
    g2.observe(50_000.0)
    assert g2.adaptive_timeout_ms() == 120_000.0    # 3*50s capped at 120s
    g3 = RuntimeGauges()
    g3.observe(15_000.0)
    assert g3.adaptive_timeout_ms() == 45_000.0     # 3*EMA floor > base

    # a thrown batch (no meaningful wall): streak bumps, EMA untouched
    ema_before = g3.ema_batch_ms
    g3.observe(0.0, failed=True)
    assert g3.ema_batch_ms == ema_before and g3.consecutive_failures == 1
