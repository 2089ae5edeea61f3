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


def test_load_from_json(tmp_path, monkeypatch):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"max_line_size": 512, "index_name": "logs"}))
    cfg = PipelineConfig.load(str(p))
    assert cfg.max_line_size == 512
    # CFG_PATH env override (settings.rs:116)
    monkeypatch.setenv("CFG_PATH", str(p))
    assert PipelineConfig.load().max_line_size == 512
