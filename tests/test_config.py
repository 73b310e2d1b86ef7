"""Config-node tests: yacs-compatible merge, freeze, and CLI coercion."""

import pytest

from dual_space_nerf_tpu.config import get_cfg_defaults


def test_merge_from_list_coercion():
    """yacs-style literal_eval coercion: bare scientific notation must
    parse as float (PyYAML's resolver would keep '5e-4' a string) and
    YAML-1.1 bool words must stay strings."""
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["SOLVER.BASE_LR", "5e-4"])
    assert cfg.SOLVER.BASE_LR == 5e-4
    cfg.merge_from_list(["SOLVER.MAX_EPOCHS", "50"])
    assert cfg.SOLVER.MAX_EPOCHS == 50
    cfg.merge_from_list(["MODEL.LOSS", "NO"])  # a string slot stays str
    assert cfg.MODEL.LOSS == "NO"
    cfg.merge_from_list(["MODEL.LOSSwMask", "True"])
    assert cfg.MODEL.LOSSwMask is True


def test_merge_from_list_rejects_bad_key_and_type():
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["SOLVER.NO_SUCH_KEY", "1"])
    with pytest.raises(TypeError):
        cfg.merge_from_list(["SOLVER.MAX_EPOCHS", "not_a_number"])


def test_freeze_blocks_writes():
    cfg = get_cfg_defaults()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 1.0
    assert cfg.SOLVER.BASE_LR == 1.0


def test_clone_is_deep():
    cfg = get_cfg_defaults()
    c2 = cfg.clone()
    c2.SOLVER.BASE_LR = 123.0
    assert cfg.SOLVER.BASE_LR != 123.0
