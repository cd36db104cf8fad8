import os

import pytest

from object_intrinsics_tpu.utils.config import (
    build_from_config,
    check_cfg_consistency,
    load_cfg_from_dict,
    overwrite_cfg_from_dotlist,
    register_target,
    resolve_with_omegaconf,
)


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nb:\n  c: 2\n  d: 3\n")
    child = {"_BASE_": str(base), "b": {"c": 5}}
    cfg = load_cfg_from_dict(child, str(tmp_path))
    assert cfg == {"a": 1, "b": {"c": 5, "d": 3}}


def test_overwrite_marker(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("b:\n  c: 2\n  d: 3\n")
    child = {"_BASE_": str(base), "b": {"__overwrite__": True, "c": 5}}
    cfg = load_cfg_from_dict(child, str(tmp_path))
    assert cfg == {"b": {"c": 5}}


def test_interpolation_and_resolvers():
    cfg = {
        "resolution": 128,
        "data": {"res": "${resolution}", "half": "${div:${resolution},2}"},
        "neg": "${not:True}",
        "scaled": "${mult:${resolution},2}",
    }
    out = resolve_with_omegaconf(cfg)
    assert out["data"]["res"] == 128
    assert out["data"]["half"] == 64.0
    assert out["neg"] is False
    assert out["scaled"] == 256


def test_dotlist_override():
    cfg = {"training": {"lr": 1e-4}}
    overwrite_cfg_from_dotlist(cfg, ["training.lr=2e-5", "training.new.flag=true"])
    assert cfg["training"]["lr"] == 2e-5
    assert cfg["training"]["new"]["flag"] is True


def test_build_from_config_registry():
    @register_target("tests.dummy.Thing")
    class Thing:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = build_from_config({"__target__": "tests.dummy.Thing", "kwargs": {"a": 1}}, b=7)
    assert (obj.a, obj.b) == (1, 7)
    # bare string resolves to the callable itself
    assert build_from_config("tests.dummy.Thing") is Thing


def test_reference_targets_registered():
    import object_intrinsics_tpu  # noqa: F401  registry bootstrap
    from object_intrinsics_tpu.utils.config import TARGET_REGISTRY

    for name in [
        "src.models.generator.Generator",
        "src.models.camera_network.Camera",
        "src.utils.pose_sampler.Plane",
        "src.utils.prior.build_directional_light_optimizable",
        "src.models.discriminator.ADADiscriminatorView",
        "src.third_party.ada.augment.AugmentPipe",
        "src.loss.gan.GANLoss",
        "src.loss.position.linear_increase",
    ]:
        assert name in TARGET_REGISTRY, name


def test_consistency_check():
    a = {"x": 1, "y": {"z": 2}}
    b = {"x": 1, "y": {"z": 3}}
    assert check_cfg_consistency(a, a)
    assert not check_cfg_consistency(a, b)
    assert check_cfg_consistency(a, b, ignore_keys=["y.*"])
