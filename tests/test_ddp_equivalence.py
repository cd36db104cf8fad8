"""DDP-equals-large-batch invariant: an 8-device data_parallel_step must
average per-chip gradients exactly, and match a single-device step on the
same global batch up to the measured per-sample-vs-batched noise floor.

This is the multi-chip correctness contract the reference gets from DDP
gradient averaging (reference scripts/train.py:158 DistributedDataParallel
wrap + SURVEY §2.7). With no real multi-chip hardware in CI, this
pinned-input equivalence on the virtual 8-device CPU mesh IS the evidence
that parallel/mesh.py's shard_map + grad_sync machinery computes the math it
claims. (It caught a real bug when first written: under jax>=0.9 VMA
semantics jax.grad inside shard_map already psums grads of replicated
params, so the old lax.pmean grad_sync was an identity on the sum — every
mesh run effectively scaled the lr by the device count.)

Setup makes the step deterministic in everything except the device layout:
  * generator stochastic inputs (b2w / z / bg_color) pinned through the
    gen_* batch pass-through (they shard with the batch);
  * renderer perturb=0, discriminator aug_p=0 -> the per-chip fold_in key
    no longer influences any value;
  * plain SGD optimizers, so updates inherit the gradients' tolerance
    instead of amplifying rounding-scale sign flips through Adam/RMSprop
    normalization;
  * ONE shared pose for all samples so the eikonal loss's masked mean
    (renderer.py render_core: sum(mask*err)/sum(mask)) has equal per-sample
    counts — mean-of-per-chip-means == global masked mean exactly. z / bg /
    real images stay distinct per sample, so a sharding bug that drops or
    duplicates a batch row breaks the match.

Two tiers:
  1. TIGHT — generator grads from the mesh vs the hand-averaged mean of the
     same bs=1 step body run per sample on one device: the identical
     program, so only collective reduction order differs.
  2. LOOSE — all grads/stats/state vs a single-device bs=8 step: the bs=1
     and bs=8 programs compute sums in different orders and the
     discriminators see fakes from marginally different post-update
     generator params, a measured ~1e-1-of-leaf-max noise floor (see
     docs/DESIGN.md); still catches any mis-scaled reduction (the lr-x-N
     bug above was a 700% discrepancy).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_trainer

N_DEV = 8
KW = dict(resolution=16, n_samples=4, n_importance=2, aug_p=0, perturb=0, sgd=True)


def _pinned_batch(gen, bs, seed=0):
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(123)
    b2w_one = np.asarray(gen.pose_prior(key, 1))  # (1, 4, 4)
    return {
        "image": rng.rand(bs, 16, 16, 3).astype(np.float32),
        "mask": (rng.rand(bs, 16, 16, 1) > 0.5).astype(np.float32),
        "gen_b2w": np.tile(b2w_one, (bs, 1, 1)).astype(np.float32),
        "gen_z": rng.randn(bs, gen.z_dim).astype(np.float32),
        "gen_bg_color": rng.rand(bs, 3).astype(np.float32),
    }


def _flat(tree):
    return {
        "/".join(map(str, path)): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _copy(tree):
    return jax.tree.map(lambda x: jnp.array(np.asarray(x)), tree)


def _leafwise_close(a_tree, b_tree, frac, what):
    """Per-leaf |a-b| <= frac * max|b| (+ tiny floor) — scale-relative."""
    a_fl, b_fl = _flat(a_tree), _flat(b_tree)
    assert set(a_fl) == set(b_fl) and len(a_fl) > 0
    for k in sorted(a_fl):
        tol = frac * (np.abs(b_fl[k]).max() + 1e-12) + 1e-12
        np.testing.assert_allclose(
            a_fl[k], b_fl[k], rtol=0, atol=tol, err_msg=f"{what} {k}"
        )


@pytest.fixture(scope="module")
def run_all():
    from object_intrinsics_tpu.parallel.mesh import data_parallel_step, make_mesh

    assert jax.device_count() >= N_DEV
    mesh = make_mesh(N_DEV)
    t_dp = _build_trainer(mesh, **KW)
    t_1d = _build_trainer(None, **KW)

    # identical seeds -> identical initial states on both paths
    p0_dp, p0_1d = _flat(t_dp.state), _flat(t_1d.state)
    for k in p0_dp:
        np.testing.assert_array_equal(p0_dp[k], p0_1d[k], err_msg=k)

    batch = {k: jnp.asarray(v) for k, v in _pinned_batch(t_dp.generator, N_DEV).items()}
    key = jax.random.PRNGKey(7)

    step_dp = data_parallel_step(t_dp._make_step_body(1, return_grads=True), mesh)
    step_1d = jax.jit(t_1d._make_step_body(N_DEV, return_grads=True))
    # donated inputs: each path gets its own deep copy of the shared state
    state_dp, out_dp = step_dp(_copy(t_dp.state), batch, key)
    state_1d, out_1d = step_1d(_copy(t_1d.state), batch, key)

    # oracle: the SAME bs=1 step body run per sample on ONE device, grads
    # hand-averaged — exactly what grad_sync must compute across chips
    step_one = jax.jit(t_1d._make_step_body(1, return_grads=True))
    per_sample = []
    for i in range(N_DEV):
        b1 = {k: v[i : i + 1] for k, v in batch.items()}
        k1 = jax.random.fold_in(key, i)  # the per-chip fold_in (values unused)
        _, o1 = step_one(_copy(t_1d.state), b1, k1)
        per_sample.append(o1["grads"]["generator"])
    g_oracle = jax.tree.map(
        lambda *xs: sum(jnp.asarray(x) for x in xs) / N_DEV, *per_sample
    )
    return dict(state_dp=state_dp, out_dp=out_dp, state_1d=state_1d,
                out_1d=out_1d, g_oracle=g_oracle)


def test_grad_sync_is_exact_mean_of_per_chip_grads(run_all):
    """TIGHT: mesh generator grads == hand-averaged per-sample grads of the
    identical bs=1 program — collective reduction order only."""
    _leafwise_close(
        run_all["out_dp"]["grads"]["generator"], run_all["g_oracle"],
        frac=1e-4, what="generator grad",
    )


def test_data_parallel_step_matches_global_batch(run_all):
    """LOOSE vs the bs=8 single-device step (inherent per-sample-vs-batched
    noise floor), plus tight scalar stats."""
    out_dp, out_1d = dict(run_all["out_dp"]), dict(run_all["out_1d"])
    grads_dp, grads_1d = out_dp.pop("grads"), out_1d.pop("grads")
    for player in ("generator", "discriminator", "mask_discriminator"):
        _leafwise_close(grads_dp[player], grads_1d[player], frac=0.1,
                        what=f"{player} grad")

    s_dp = {k: float(v) for k, v in out_dp.items()}
    s_1d = {k: float(v) for k, v in out_1d.items()}
    assert set(s_dp) == set(s_1d)
    for k in sorted(s_dp):
        np.testing.assert_allclose(s_dp[k], s_1d[k], rtol=1e-2, atol=1e-5,
                                   err_msg=f"stat {k}")

    # post-update state: SGD updates inherit the grads' tolerance; any
    # mis-scaled sync (the lr-x-N class) shifts params by ~N*lr*|g| instead
    n_dp, n_1d = _flat(run_all["state_dp"]), _flat(run_all["state_1d"])
    assert set(n_dp) == set(n_1d)
    for k in sorted(n_dp):
        if n_dp[k].dtype.kind not in "fc":
            np.testing.assert_array_equal(n_dp[k], n_1d[k], err_msg=k)
            continue
        np.testing.assert_allclose(n_dp[k], n_1d[k], rtol=1e-3, atol=2e-5,
                                   err_msg=f"state {k}")


def test_pinned_inputs_actually_pin():
    """Two different step keys must give identical results under the pinned
    config — otherwise the equivalence test would be comparing luck. Fresh
    identical twins, same batch, different keys, bitwise-equal stats."""
    t_a = _build_trainer(None, **KW)
    t_b = _build_trainer(None, **KW)
    batch = _pinned_batch(t_a.generator, N_DEV, seed=9)
    sa = {k: float(v) for k, v in t_a.train_step(batch, jax.random.PRNGKey(100)).items()}
    sb = {k: float(v) for k, v in t_b.train_step(batch, jax.random.PRNGKey(200)).items()}
    for k in sa:
        np.testing.assert_allclose(sa[k], sb[k], rtol=0, atol=0, err_msg=f"stat {k}")
