"""Config / hpconfig parser tests (``tf_utils/hparams.py`` parity)."""

import pytest

from iaf_tpu.core.config import Config, get_default_hparams


def test_reference_reproduction_command_parses():
    """The exact README hpconfig string must parse unchanged."""
    cfg = get_default_hparams().parse(
        "depth=1,num_blocks=20,kl_min=0.25,learning_rate=0.002,batch_size=32")
    assert cfg.depth == 1
    assert cfg.num_blocks == 20
    assert cfg.kl_min == 0.25
    assert cfg.learning_rate == 0.002
    assert cfg.batch_size == 32


def test_type_inference():
    cfg = Config().parse("binarize=true,seed=7,dataset=mnist,kl_min=0")
    assert cfg.binarize is True
    assert cfg.seed == 7
    assert cfg.dataset == "mnist"
    assert cfg.kl_min == 0.0 and isinstance(cfg.kl_min, float)


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        Config().parse("not_a_param=3")


def test_malformed_item_raises():
    with pytest.raises(ValueError):
        Config().parse("depth")


def test_bad_bool_raises():
    with pytest.raises(ValueError):
        Config().parse("binarize=maybe")


def test_frozen_and_hashable():
    cfg = Config()
    hash(cfg)  # static jit arg requirement
    with pytest.raises(Exception):
        cfg.depth = 3  # type: ignore[misc]


def test_empty_spec_identity():
    assert Config().parse("") == Config()


def test_ar_hidden_fallback():
    assert Config(h_size=160, ar_hidden_size=0).ar_hidden == 160
    assert Config(h_size=160, ar_hidden_size=320).ar_hidden == 320
