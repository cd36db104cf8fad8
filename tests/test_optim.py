"""Optimizer semantics vs torch (GANs amplify small numeric drift)."""
import numpy as np
import pytest


def _torch_steps(opt_name, lr, n=5, **kw):
    import torch

    torch.manual_seed(0)
    p = torch.nn.Parameter(torch.tensor([1.0, -2.0, 0.5], dtype=torch.float64))
    if opt_name == "adam":
        opt = torch.optim.Adam([p], lr=lr, **kw)
    else:
        opt = torch.optim.RMSprop([p], lr=lr, **kw)
    traj = []
    for i in range(n):
        g = torch.tensor([0.1 * (i + 1), -0.2, 0.05 * (i + 1) ** 2], dtype=torch.float64)
        opt.zero_grad()
        p.grad = g
        opt.step()
        traj.append(p.detach().numpy().copy())
    return np.asarray(traj)


def _jax_steps(tx, n=5):
    import jax.numpy as jnp
    import optax

    p = jnp.asarray([1.0, -2.0, 0.5], dtype=jnp.float64)
    state = tx.init(p)
    traj = []
    for i in range(n):
        g = jnp.asarray([0.1 * (i + 1), -0.2, 0.05 * (i + 1) ** 2], dtype=jnp.float64)
        upd, state = tx.update(g, state, p)
        p = optax.apply_updates(p, upd)
        traj.append(np.asarray(p))
    return np.asarray(traj)


@pytest.fixture(autouse=True)
def _x64():
    import jax

    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_adam_matches_torch():
    import optax

    ours = _jax_steps(
        optax.chain(
            optax.scale_by_adam(b1=0.0, b2=0.9, eps=1e-8, eps_root=0.0),
            optax.scale_by_learning_rate(2e-5),
        )
    )
    ref = _torch_steps("adam", 2e-5, betas=(0.0, 0.9))
    assert np.allclose(ours, ref, atol=1e-10), np.abs(ours - ref).max()


def test_rmsprop_matches_torch():
    import optax

    from object_intrinsics_tpu.trainers.optim import scale_by_rmsprop_torch

    ours = _jax_steps(
        optax.chain(scale_by_rmsprop_torch(), optax.scale_by_learning_rate(1e-4))
    )
    ref = _torch_steps("rmsprop", 1e-4)
    assert np.allclose(ours, ref, atol=1e-10), np.abs(ours - ref).max()


def test_step_lr_schedule():
    from object_intrinsics_tpu.trainers.optim import step_lr

    sch = step_lr(base_lr=1e-3, step_size=100, gamma=0.5)
    assert sch(0) == 1e-3
    assert sch(99) == 1e-3
    assert sch(100) == 5e-4
    assert sch(250) == 2.5e-4
