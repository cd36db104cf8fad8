"""Reverse-interop: our checkpoints exported as reference-format model.pt.

Validates tools/export_torch_checkpoint.py by (a) checking the exported
generator key set against the reference's module naming
(src/models/generator.py:34-47 + the stylesdf/neus layer classes), and
(b) rebuilding the reference's OWN torch trunk (FiLMSiren/LinearLayer,
importable on CPU) from the exported tensors and matching its forward
against ours — the end-to-end proof that the (in,out)->(out,in) and
HWIO->OIHW layout conversions are right.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference missing")


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """A tiny fresh trainer state, checkpointed then exported to .pt."""
    import json

    import torch

    from __graft_entry__ import _build_trainer, _disc_cfg, _generator_cfg
    from tools.export_torch_checkpoint import export

    run_dir = tmp_path_factory.mktemp("run")
    trainer = _build_trainer(mesh=None, resolution=16)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(1, 16, 16, 3).astype(np.float32),
        "mask": (rng.rand(1, 16, 16, 1) > 0.5).astype(np.float32),
    }
    for i in range(2):  # nonzero optimizer moments + it
        trainer.train_step(batch, jax.random.fold_in(jax.random.PRNGKey(42), i))
    ckpt_dir = run_dir / "checkpoints"
    ckpt_dir.mkdir()
    trainer.checkpoint_io.checkpoint_dir = str(ckpt_dir)
    trainer.save_checkpoint(blocking=True, epoch=3)
    cfg = {
        "model": {
            "generator": _generator_cfg(resolution=16, n_samples=4, n_importance=2),
            "discriminator": _disc_cfg(16, 3, 7, view=True),
            "mask_discriminator": _disc_cfg(16, 1, 1),
        },
        # mirrors _build_trainer's optimizers so opt_{player} export triggers
        "training": {
            "opt_generator": {"__target__": "torch.optim.Adam",
                              "kwargs": {"lr": 2e-5, "betas": [0, 0.9]}},
            "opt_discriminator": {"__target__": "torch.optim.RMSprop",
                                  "kwargs": {"lr": 1e-4}},
            "opt_mask_discriminator": {"__target__": "torch.optim.RMSprop",
                                       "kwargs": {"lr": 1e-4}},
        },
    }
    with open(run_dir / "cfg.json", "w") as f:
        json.dump(cfg, f)
    pt_path = export(str(run_dir))
    return trainer, torch.load(pt_path, weights_only=False), pt_path


def _expected_generator_keys():
    keys = {"it", "camera.intrinsics", "camera.intrinsics_inv", "camera.c2w",
            "camera.w2c", "deviation_network.variance",
            "light.param_ambient", "light.param_direction",
            "light.param_shininess", "light.param_specular"}
    for i in range(3):
        keys |= {f"sdf_network.style.{i}.weight", f"sdf_network.style.{i}.bias"}
    film = ("weight", "bias", "gamma.weight", "gamma.bias", "beta.weight", "beta.bias")
    for i in range(8):
        keys |= {f"sdf_network.pts_linears.{i}.{s}" for s in film}
    keys |= {f"color_network.views_linears.{s}" for s in film}
    keys |= {"sdf_network.sigma_linear.weight", "sdf_network.sigma_linear.bias",
             "color_network.rgb_linear.weight", "color_network.rgb_linear.bias"}
    return keys


def test_generator_key_set_matches_reference_naming(exported):
    _, pt, _ = exported
    assert set(pt["generator"].keys()) == _expected_generator_keys()
    assert pt["generator"]["it"].dtype.is_floating_point is False
    for name in ("discriminator", "mask_discriminator"):
        ks = set(pt[name].keys())
        assert {"conv_out.weight", "aug.p", "aug.Hz_geom", "aug.Hz_fbank"} <= ks
        assert any(k.startswith("blocks.0.") for k in ks)
    for ema in ("ema@0.99", "ema@0.9"):
        assert set(pt[ema].keys()) == {"state_dict", "beta"}
        assert set(pt[ema]["state_dict"].keys()) == _expected_generator_keys()


def test_exported_trunk_runs_in_reference_modules(exported):
    import torch

    sys.path.insert(0, REF)
    from src.third_party.stylesdf.volume_renderer import FiLMSiren, LinearLayer

    from object_intrinsics_tpu.models import fields

    trainer, pt, _ = exported
    sd = pt["generator"]

    layers = [FiLMSiren(3, 128, style_dim=64, is_first=True)] + [
        FiLMSiren(128, 128, style_dim=64) for _ in range(7)
    ]
    head = LinearLayer(128, 1, freq_init=True)
    with torch.no_grad():
        for i, m in enumerate(layers):
            p = f"sdf_network.pts_linears.{i}"
            m.weight.copy_(sd[f"{p}.weight"])
            m.bias.copy_(sd[f"{p}.bias"])
            m.gamma.weight.copy_(sd[f"{p}.gamma.weight"])
            m.gamma.bias.copy_(sd[f"{p}.gamma.bias"])
            m.beta.weight.copy_(sd[f"{p}.beta.weight"])
            m.beta.bias.copy_(sd[f"{p}.beta.bias"])
        head.weight.copy_(sd["sdf_network.sigma_linear.weight"])
        head.bias.copy_(sd["sdf_network.sigma_linear.bias"])

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(2, 32, 3)).astype(np.float32)
    w = rng.randn(2, 64).astype(np.float32)
    with torch.no_grad():
        x = torch.tensor(pts).reshape(2, 32, 1, 1, 3)
        for m in layers:
            x = m(x, torch.tensor(w))
        ref_sdf = head(x).reshape(2, 32, 1).numpy()

    g_params = trainer.state["params"]["generator"]["sdf_network"]
    ours = np.asarray(fields.shape_sdf(
        {k: g_params[k] for k in ("style", "pts_linears", "sigma_linear")},
        jnp.asarray(pts), jnp.asarray(w)))
    assert np.abs(ours - ref_sdf).max() < 1e-4


def test_conv_and_ema_layouts_roundtrip(exported):
    trainer, pt, _ = exported
    d = trainer.state["params"]["discriminator"]
    got = pt["discriminator"]["blocks.0.weight"].numpy()
    np.testing.assert_array_equal(got.transpose(2, 3, 1, 0), np.asarray(d["blocks"][0]["w"]))
    e = pt["ema@0.9"]["state_dict"]["sdf_network.pts_linears.0.weight"].numpy()
    np.testing.assert_array_equal(
        e.T, np.asarray(trainer.state["ema"]["ema@0.9"]["sdf_network"]["pts_linears"][0]["w"]))
    assert pt["ema@0.9"]["beta"] == 0.9


def test_import_roundtrips_bit_exact(exported, tmp_path):
    """model.pt -> our npz (tools/import_torch_checkpoint.py) inverts the
    export exactly: params, EMA trees, and it survive bit-for-bit, and the
    trainer can RESUME from the imported (optimizer-free) checkpoint with
    freshly initialized moments."""
    from object_intrinsics_tpu.utils.checkpoint import load_pytree
    from tools.import_torch_checkpoint import import_checkpoint

    trainer, _, pt_path = exported
    out = import_checkpoint(pt_path, str(tmp_path / "imported"))
    state, meta = load_pytree(out)

    def assert_equal(a, b):
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    assert_equal(state["params"], trainer.state["params"])
    assert_equal(state["ema"], trainer.state["ema"])
    assert int(np.asarray(state["it"])) == int(np.asarray(trainer.state["it"]))
    assert meta["epoch"] == 3

    # resume-from-imported WITHOUT optimizer entries (e.g. an inference-only
    # .pt): the trainer falls back to freshly initialized moments
    import torch

    from __graft_entry__ import _build_trainer

    stripped = {k: v for k, v in torch.load(pt_path, weights_only=False).items()
                if not k.startswith(("opt_", "sch_"))}
    torch.save(stripped, tmp_path / "noopt.pt")
    out2 = import_checkpoint(str(tmp_path / "noopt.pt"), str(tmp_path / "noopt"))
    state2, _ = load_pytree(out2)
    assert "opt" not in state2
    fresh = _build_trainer(mesh=None, resolution=16)
    fresh.load_checkpoint(out2)
    assert_equal(fresh.state["params"], trainer.state["params"])
    assert int(fresh.it) == int(np.asarray(trainer.state["it"]))


def test_exported_optimizers_drive_real_torch_optim(exported):
    """torch.optim.Adam/RMSprop accept the exported opt_{player} state_dicts
    and step — proving param_groups completeness and per-index moment
    shapes on this torch version. StepLR accepts sch_{player}."""
    import torch

    trainer, pt, _ = exported
    # check BEFORE stepping: torch shares the loaded step tensors, and
    # opt.step() increments them in place
    g0 = pt["opt_generator"]["state"][10]
    assert float(g0["exp_avg_sq"].abs().sum()) > 0  # real moments, not zeros
    assert float(g0["step"]) == 2.0  # two fixture train steps
    for player, cls in (("generator", torch.optim.Adam),
                        ("discriminator", torch.optim.RMSprop),
                        ("mask_discriminator", torch.optim.RMSprop)):
        sd = pt[f"opt_{player}"]
        n = len(sd["param_groups"][0]["params"])
        assert set(sd["state"].keys()) == set(range(n))
        moment = "exp_avg" if cls is torch.optim.Adam else "square_avg"
        params = [torch.nn.Parameter(torch.zeros_like(sd["state"][i][moment]))
                  for i in range(n)]
        opt = cls(params, lr=1.0)
        opt.load_state_dict(sd)
        for p in params:
            p.grad = torch.ones_like(p)
        opt.step()  # must not raise (missing hyperparam keys would KeyError)
        sch = torch.optim.lr_scheduler.StepLR(opt, step_size=10**9, gamma=1.0)
        sch.load_state_dict(pt[f"sch_{player}"])
        sch.step()


def test_imported_optimizer_state_resumes_identically(exported, tmp_path):
    """The strongest interop check: trainer A's full training state survives
    export->import, and a resumed trainer B takes the SAME next step (same
    batch, same key) to bit-identical parameters — moments included."""
    from tools.import_torch_checkpoint import import_checkpoint
    from __graft_entry__ import _build_trainer

    trainer, _, pt_path = exported
    # pass the run's cfg.json so has_schedule matches the (schedule-less)
    # target optimizers; a bare .pt defaults to the reference's
    # schedule-present convention
    cfg_path = os.path.join(os.path.dirname(os.path.dirname(pt_path)), "cfg.json")
    out = import_checkpoint(pt_path, str(tmp_path / "resume"), cfg_path=cfg_path)

    fresh = _build_trainer(mesh=None, resolution=16)
    fresh.load_checkpoint(out)
    assert int(fresh.it) == int(trainer.it)

    rng = np.random.RandomState(7)
    batch = {
        "image": rng.rand(1, 16, 16, 3).astype(np.float32),
        "mask": (rng.rand(1, 16, 16, 1) > 0.5).astype(np.float32),
    }
    key = jax.random.PRNGKey(99)
    sa = trainer.train_step(dict(batch), key)
    sb = fresh.train_step(dict(batch), key)
    np.testing.assert_allclose(float(sa["generator/loss"]),
                               float(sb["generator/loss"]), rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(trainer.state["params"]),
                    jax.tree.leaves(fresh.state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(trainer.state["opt"]),
                    jax.tree.leaves(fresh.state["opt"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sgd_optimizer_translation_roundtrip():
    """SGD chain layouts differ from Adam/RMSprop ([wd?][trace?][lr]): the
    momentum-trace export must find the element before the lr state, real
    torch.optim.SGD must accept it, and the import must invert it. The
    momentum=0 chain (no per-param torch state) must export without crashing
    and import as None (fresh moments)."""
    import torch

    from object_intrinsics_tpu.trainers.optim import sgd
    from tools.export_torch_checkpoint import export_optimizer
    from tools.import_torch_checkpoint import import_optimizer

    params = {
        "blocks": [{"w": np.arange(12, dtype=np.float32).reshape(2, 2, 1, 3)}],
        "conv_out": {"w": np.full((2, 2, 3, 1), 2.0, np.float32)},
    }
    jparams = jax.tree.map(jnp.asarray, params)
    grads = jax.tree.map(jnp.ones_like, jparams)

    tx = sgd(lr=0.1, momentum=0.9)(None)
    st = tx.init(jparams)
    _, st = tx.update(grads, st, jparams)  # nonzero trace
    cfg = {"__target__": "torch.optim.SGD",
           "kwargs": {"lr": 0.1, "momentum": 0.9}}
    sd = export_optimizer("discriminator", st, params, cfg)
    assert set(sd["state"].keys()) == {0, 1}
    # conv moment rides the weight's HWIO->OIHW transform
    np.testing.assert_array_equal(
        sd["state"][0]["momentum_buffer"].numpy().transpose(2, 3, 1, 0),
        np.asarray(jax.tree.leaves(st[-2][0])[0]))

    import copy

    tparams = [torch.nn.Parameter(torch.zeros_like(sd["state"][i]["momentum_buffer"]))
               for i in range(2)]
    opt = torch.optim.SGD(tparams, lr=0.1, momentum=0.9)
    # deep-copy: torch steps mutate the loaded buffers in place, and sd is
    # re-read by the import below
    opt.load_state_dict(copy.deepcopy(sd))
    for p in tparams:
        p.grad = torch.ones_like(p)
    opt.step()

    back = import_optimizer("discriminator", sd, params, has_schedule=False)
    assert back is not None and back[1] == []
    for a, b in zip(jax.tree.leaves(back[0]), jax.tree.leaves(st[-2][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # momentum=0: single-element chain, empty torch state
    tx0 = sgd(lr=0.1)(None)
    st0 = tx0.init(jparams)
    _, st0 = tx0.update(grads, st0, jparams)
    sd0 = export_optimizer(
        "discriminator", st0, params,
        {"__target__": "torch.optim.SGD", "kwargs": {"lr": 0.1}})
    assert sd0["state"] == {}
    assert import_optimizer("discriminator", sd0, params) is None
