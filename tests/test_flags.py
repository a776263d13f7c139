"""Dataclass CLI override system."""

import argparse

from nawc_tpu.utils.config import CodecConfig, SemanticWMConfig
from nawc_tpu.utils.flags import add_dataclass_args, dataclass_from_args


def test_overrides_applied():
    ap = argparse.ArgumentParser()
    add_dataclass_args(ap, CodecConfig, "cfg")
    args = ap.parse_args(["--cfg.encoder_dim", "16", "--cfg.vq_strides", "8,4,2,1"])
    cfg = dataclass_from_args(CodecConfig, args, "cfg")
    assert cfg.encoder_dim == 16
    assert cfg.vq_strides == (8, 4, 2, 1)
    assert cfg.latent_dim == CodecConfig().latent_dim  # untouched default


def test_no_overrides_returns_base():
    ap = argparse.ArgumentParser()
    add_dataclass_args(ap, SemanticWMConfig, "wm")
    args = ap.parse_args([])
    base = SemanticWMConfig(steps=7)
    cfg = dataclass_from_args(SemanticWMConfig, args, "wm", base=base)
    assert cfg is base


def test_bool_and_float_fields():
    ap = argparse.ArgumentParser()
    add_dataclass_args(ap, SemanticWMConfig, "wm")
    args = ap.parse_args(["--wm.dynamic_eps", "true", "--wm.lr", "0.01"])
    cfg = dataclass_from_args(SemanticWMConfig, args, "wm")
    assert cfg.dynamic_eps is True
    assert cfg.lr == 0.01
