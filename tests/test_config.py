"""Config serialization: round-trip, removed-key tolerance, and typo
rejection (a silently-defaulted key can burn a multi-hour chip run)."""

import pytest

from legion_tpu.config import Config, SamplerConfig, TrainConfig


def test_json_roundtrip():
    cfg = Config(sampler=SamplerConfig(fanouts=(5, 3), batch_size=64),
                 train=TrainConfig(learning_rate=0.01, epochs=7))
    r = Config.from_json(cfg.to_json())
    assert r.sampler.fanouts == (5, 3)
    assert r.train.epochs == 7
    assert r == cfg


def test_removed_keys_tolerated():
    s = ('{"sampler": {"batch_size": 32, "drop_last": true, '
         '"payload_bytes": 512}, "parallel": {"data_axis": "x"}}')
    cfg = Config.from_json(s)
    assert cfg.sampler.batch_size == 32


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="learning_rat"):
        Config.from_json('{"train": {"learning_rat": 0.0001}}')
    with pytest.raises(ValueError, match="fanout"):
        Config.from_json('{"sampler": {"fanout": [25, 10]}}')
