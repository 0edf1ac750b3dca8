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
    # free ar_hidden width is a dense-path capability; the conv path pins
    # it to h_size (context add) and rejects mismatches at construction
    assert Config(h_size=160, ar_hidden_size=320,
                  ar_kind="dense").ar_hidden == 320
    with pytest.raises(ValueError, match="ar_hidden_size"):
        Config(h_size=160, ar_hidden_size=320)
    # configs that never build the conv AR net are exempt: diag flow (no
    # flow at all) must not reject a stale ar_hidden_size (e.g. from an
    # old hps.json loaded via resolve_config)
    Config(h_size=160, ar_hidden_size=320, flow="diag")
    Config(h_size=160, ar_hidden_size=320, flow="diag", depth_ar=0)
    # conv AR with no hidden layer would silently drop the context add
    with pytest.raises(ValueError, match="depth_ar=0"):
        Config(depth_ar=0)
    # the kernel switch is validated (a typo must not silently measure XLA)
    with pytest.raises(ValueError, match="kernels"):
        Config(kernels="palas")


def test_hparams_save_load_roundtrip(tmp_path):
    from iaf_tpu.core.config import load_hparams, save_hparams

    cfg = Config().parse("depth=3,kl_min=0.5,likelihood=bernoulli")
    save_hparams(cfg, str(tmp_path))
    assert load_hparams(str(tmp_path)) == cfg
    assert load_hparams(str(tmp_path / "nope")) is None


def test_hparams_load_skips_unknown_keys(tmp_path):
    import json

    from iaf_tpu.core.config import HPS_FILENAME, load_hparams, save_hparams

    save_hparams(Config(depth=7), str(tmp_path))
    p = tmp_path / HPS_FILENAME
    d = json.loads(p.read_text())
    d["from_the_future"] = 42
    p.write_text(json.dumps(d))
    got = load_hparams(str(tmp_path))
    assert got is not None and got.depth == 7


def test_resolve_config_layering(tmp_path):
    from iaf_tpu.core.config import resolve_config, save_hparams

    # no saved config: defaults + hpconfig
    cfg = resolve_config(str(tmp_path), "depth=5", mode="eval_test")
    assert cfg.depth == 5 and cfg.logdir == str(tmp_path)
    # saved config is the base; CLI string still wins on conflict
    save_hparams(Config(depth=9, h_size=48), str(tmp_path))
    cfg = resolve_config(str(tmp_path), "depth=5", mode="eval_test")
    assert cfg.depth == 5 and cfg.h_size == 48
    cfg = resolve_config(str(tmp_path), "", mode="sample")
    assert cfg.depth == 9
