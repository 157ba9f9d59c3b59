"""Fused SA slab kernel (ops/fused_sa.py) vs the unfused jnp reference.

Runs the Pallas kernels in interpret mode on CPU (conftest forces the CPU
backend). Covers: training forward (pooled output + batch statistics), eval
forward, and the custom VJP against autodiff of the reference chain — for
both a C1==C3 shape (RCNN SA_0-like) and a widening shape (SA_1-like).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu3d.ops.fused_sa import (
    fused_bn_mlp_pool,
    fused_bn_mlp_pool_reference,
    fused_gathered_mlp_pool,
    fused_mlp_pool,
    fused_mlp_pool_reference,
    fused_sa_supported,
)

SHAPES = [
    # (B, M, S, C1, C2, C3)
    (2, 4, 16, 128, 128, 128),   # SA_0-like (scaled down)
    (2, 2, 16, 128, 128, 256),   # SA_1-like widening
]


def _make_case(shape, seed=0):
    B, M, S, C1, C2, C3 = shape
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(size=(B, M, S, C1)), jnp.float32
                     ).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(C1, C2)) / np.sqrt(C1), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(C2, C3)) / np.sqrt(C2), jnp.float32)
    gammas = tuple(jnp.asarray(1.0 + 0.1 * rng.normal(size=c), jnp.float32)
                   for c in (C1, C2, C3))
    betas = tuple(jnp.asarray(0.1 * rng.normal(size=c), jnp.float32)
                  for c in (C1, C2, C3))
    return x0, w1, w2, gammas, betas


@pytest.mark.parametrize("shape", SHAPES)
def test_fused_train_forward_matches_reference(shape):
    x0, w1, w2, gammas, betas = _make_case(shape)
    out, (means, vars_) = jax.jit(
        lambda *a: fused_bn_mlp_pool(*a, interpret=True))(
        x0, w1, w2, gammas, betas)
    ref, (rmeans, rvars) = fused_bn_mlp_pool_reference(
        x0, w1, w2, gammas, betas)
    assert out.shape == ref.shape == (shape[0], shape[1], shape[5])
    for k in range(3):
        np.testing.assert_allclose(np.asarray(means[k]),
                                   np.asarray(rmeans[k]), atol=2e-3, rtol=0)
        np.testing.assert_allclose(np.asarray(vars_[k]),
                                   np.asarray(rvars[k]), atol=2e-2,
                                   rtol=2e-2)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.1, err.max()
    assert err.mean() < 0.01


@pytest.mark.parametrize("shape", SHAPES)
def test_fused_eval_forward_matches_reference(shape):
    x0, w1, w2, gammas, betas = _make_case(shape, seed=1)
    rng = np.random.default_rng(2)
    stats = tuple(
        (jnp.asarray(0.05 * rng.normal(size=c), jnp.float32),
         jnp.asarray(1.0 + 0.1 * rng.random(size=c), jnp.float32))
        for c in (shape[3], shape[4], shape[5]))
    out = jax.jit(lambda *a: fused_bn_mlp_pool(*a, stats=stats,
                                               interpret=True))(
        x0, w1, w2, gammas, betas)
    ref = fused_bn_mlp_pool_reference(x0, w1, w2, gammas, betas, stats=stats)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.1, err.max()
    assert err.mean() < 0.01


@pytest.mark.parametrize("shape", SHAPES)
def test_fused_train_grads_match_reference_autodiff(shape):
    x0, w1, w2, gammas, betas = _make_case(shape, seed=3)
    g = jnp.asarray(np.random.default_rng(4).normal(
        size=(shape[0], shape[1], shape[5])), jnp.float32)

    def loss_fused(x0, w1, w2, gammas, betas):
        out, _ = fused_bn_mlp_pool(x0, w1, w2, gammas, betas,
                                   interpret=True)
        return jnp.sum(out.astype(jnp.float32) * g)

    def loss_ref(x0, w1, w2, gammas, betas):
        # pool="first": the kernel's max-pool tie subgradient (bf16
        # activations tie often; jnp.max's VJP splits among ties instead)
        out, _ = fused_bn_mlp_pool_reference(x0, w1, w2, gammas, betas,
                                             pool="first")
        return jnp.sum(out.astype(jnp.float32) * g)

    grads_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)))(
        x0, w1, w2, gammas, betas)
    grads_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(
        x0, w1, w2, gammas, betas)
    names = ["d_x0", "d_w1", "d_w2", "d_gammas", "d_betas"]
    for name, gf, gr in zip(names, grads_f, grads_r):
        for leaf_f, leaf_r in zip(jax.tree_util.tree_leaves(gf),
                                  jax.tree_util.tree_leaves(gr)):
            a = np.asarray(leaf_f, np.float32)
            b = np.asarray(leaf_r, np.float32)
            scale = np.abs(b).max() + 1e-3
            err = np.abs(a - b) / scale
            assert err.max() < 0.05, (name, err.max(), scale)


@pytest.mark.parametrize("shape", SHAPES)
def test_fused_nobn_forward_and_grads(shape):
    """The no-BN variant (the default.yaml RCNN head: USE_BN False):
    single-pass forward/backward kernels vs the unfused chain."""
    B, M, S, C1, C2, C3 = shape
    x0, w1, w2, _, _ = _make_case(shape, seed=5)
    rng = np.random.default_rng(6)
    b1 = jnp.asarray(0.1 * rng.normal(size=C2), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.normal(size=C3), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, M, C3)), jnp.float32)

    out = jax.jit(lambda *a: fused_mlp_pool(*a, train=True,
                                            interpret=True))(
        x0, w1, b1, w2, b2)
    ref = fused_mlp_pool_reference(x0, w1, b1, w2, b2)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.1, err.max()

    out_e = jax.jit(lambda *a: fused_mlp_pool(*a, train=False,
                                              interpret=True))(
        x0, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out_e, np.float32),
                               np.asarray(out, np.float32), atol=1e-2)

    def loss_fused(*a):
        return jnp.sum(fused_mlp_pool(*a, train=True, interpret=True
                                      ).astype(jnp.float32) * g)

    def loss_ref(*a):
        return jnp.sum(fused_mlp_pool_reference(*a, pool="first"
                                                ).astype(jnp.float32) * g)

    grads_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)))(
        x0, w1, b1, w2, b2)
    grads_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(
        x0, w1, b1, w2, b2)
    for name, gf, gr in zip(("d_x0", "d_w1", "d_b1", "d_w2", "d_b2"),
                            grads_f, grads_r):
        a = np.asarray(gf, np.float32)
        b = np.asarray(gr, np.float32)
        err = np.abs(a - b) / (np.abs(b).max() + 1e-3)
        # max tolerance is bf16-cotangent-rounding grade (the kernel and
        # autodiff round at slightly different matmul boundaries; the
        # oracle's bias grad even accumulates in bf16 where the kernel
        # accumulates f32)
        assert err.max() < 0.08, (name, err.max())
        assert err.mean() < 5e-3, (name, err.mean())


@pytest.mark.parametrize("shape", SHAPES)
def test_fused_gathered_nobn(shape):
    """v2: the grouping gather folded into the no-BN kernels — forward,
    eval, and grads (d_pre through the in-kernel transposed one-hot,
    d_center through the per-tile reduce) vs the gather + unfused chain."""
    B, M, S, C1, C2, C3 = shape
    N = 128
    rng = np.random.default_rng(9)
    pre = jnp.asarray(rng.normal(size=(B, N, C1)), jnp.float32
                      ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, size=(B, M, S)), jnp.int32)
    center = jnp.asarray(0.5 * rng.normal(size=(B, M, C1)), jnp.float32
                         ).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(C1, C2)) / np.sqrt(C1), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(C2, C3)) / np.sqrt(C2), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.normal(size=C2), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.normal(size=C3), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, M, C3)), jnp.float32)

    def ref_chain(pre, center, w1, b1, w2, b2, pool):
        gath = jnp.take_along_axis(
            pre, idx.reshape(B, M * S)[..., None], axis=1
        ).reshape(B, M, S, C1)
        x0 = gath - center[:, :, None, :]
        return fused_mlp_pool_reference(x0, w1, b1, w2, b2, pool=pool)

    out = jax.jit(lambda *a: fused_gathered_mlp_pool(
        *a, train=True, interpret=True))(pre, idx, center, w1, b1, w2, b2)
    ref = ref_chain(pre, center, w1, b1, w2, b2, "max")
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.1, err.max()

    out_e = jax.jit(lambda *a: fused_gathered_mlp_pool(
        *a, train=False, interpret=True))(pre, idx, center, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out_e, np.float32),
                               np.asarray(out, np.float32), atol=1e-2)

    def loss_fused(pre, center, w1, b1, w2, b2):
        return jnp.sum(fused_gathered_mlp_pool(
            pre, idx, center, w1, b1, w2, b2, train=True, interpret=True
        ).astype(jnp.float32) * g)

    def loss_ref(*a):
        return jnp.sum(ref_chain(*a, "first").astype(jnp.float32) * g)

    grads_f = jax.jit(jax.grad(loss_fused, argnums=tuple(range(6))))(
        pre, center, w1, b1, w2, b2)
    grads_r = jax.jit(jax.grad(loss_ref, argnums=tuple(range(6))))(
        pre, center, w1, b1, w2, b2)
    for name, gf, gr in zip(("d_pre", "d_center", "d_w1", "d_b1", "d_w2",
                             "d_b2"), grads_f, grads_r):
        a = np.asarray(gf, np.float32)
        b = np.asarray(gr, np.float32)
        err = np.abs(a - b) / (np.abs(b).max() + 1e-3)
        assert err.max() < 0.08, (name, err.max())
        assert err.mean() < 5e-3, (name, err.mean())


def test_shared_mlp_fused_pool_matches_unfused():
    """Same variables must drive both execution strategies: identical param
    tree, matching pooled output and batch-stats updates, matching eval."""
    from tpu3d.models.pointnet2 import SharedMLP

    B, M, S, Cin = 2, 4, 16, 64
    rng = np.random.default_rng(7)
    slab_in = jnp.asarray(rng.normal(size=(B, M, S, Cin)), jnp.float32
                          ).astype(jnp.bfloat16)
    mod = SharedMLP((128, 128, 128), bn=True, dtype=jnp.bfloat16)

    def fp(dense0):
        return dense0(slab_in)

    key = jax.random.PRNGKey(0)
    v_u = mod.init({"params": key}, None, train=True, first_pre=fp)
    v_f = mod.init({"params": key}, None, train=True, first_pre=fp,
                   fused_pool=True)
    # identical parameter trees (checkpoint interchangeability)
    assert (jax.tree_util.tree_structure(v_u)
            == jax.tree_util.tree_structure(v_f))
    for a, b in zip(jax.tree_util.tree_leaves(v_u),
                    jax.tree_util.tree_leaves(v_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_u, mut_u = mod.apply(v_u, None, train=True, bn_momentum=0.9,
                             first_pre=fp, mutable=["batch_stats"])
    pooled_u = jnp.max(out_u, axis=2)
    pooled_f, mut_f = mod.apply(v_u, None, train=True, bn_momentum=0.9,
                                first_pre=fp, fused_pool=True,
                                mutable=["batch_stats"])
    err = np.abs(np.asarray(pooled_f, np.float32)
                 - np.asarray(pooled_u, np.float32))
    assert err.max() < 0.1, err.max()
    for a, b in zip(jax.tree_util.tree_leaves(mut_u),
                    jax.tree_util.tree_leaves(mut_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-2)

    # eval mode (running stats)
    out_ue = mod.apply(v_u, None, train=False, first_pre=fp)
    pooled_fe = mod.apply(v_u, None, train=False, first_pre=fp,
                          fused_pool=True)
    err = np.abs(np.asarray(pooled_fe, np.float32)
                 - np.asarray(jnp.max(out_ue, axis=2), np.float32))
    assert err.max() < 0.1, err.max()


@pytest.mark.parametrize("use_bn", [True, False])
def test_sa_module_fused_dispatch_matches_unfused(monkeypatch, use_bn):
    """PointnetSAModuleMSG end-to-end: forcing the fused slab path off-TPU
    must reproduce the bf16 unfused path (same params, FPS, ball query,
    pregroup algebra) within bf16 tolerance — training and eval. use_bn
    False is the default.yaml RCNN configuration (single-pass kernels)."""
    from tpu3d.models.pointnet2 import PointnetSAModuleMSG

    # N=128 so bn=False exercises the v2 in-kernel-gather path
    # (fused_gather_supported needs a 128-multiple table)
    B, N, C = 2, 128, 128
    rng = np.random.default_rng(11)
    xyz = jnp.asarray(rng.uniform(-2, 2, size=(B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    mod = PointnetSAModuleMSG(
        npoint=16, radii=(1.5,), nsamples=(16,), mlps=((128, 128, 128),),
        use_xyz=True, bn=use_bn, query_chunk=None, dtype=jnp.bfloat16,
        canonical=True)

    key = jax.random.PRNGKey(1)

    def run(train, fused):
        monkeypatch.setenv("TPU3D_FORCE_FUSED_SA", "1")
        monkeypatch.setenv("TPU3D_DISABLE_FUSED_SA", "0" if fused else "1")
        v = mod.init({"params": key}, xyz, feats, train=True)
        if train:
            (nx, nf), mut = mod.apply(v, xyz, feats, train=True,
                                      mutable=["batch_stats"])
            return v, nx, nf, mut
        nx, nf = mod.apply(v, xyz, feats, train=False)
        return v, nx, nf, None

    v_f, nx_f, nf_f, mut_f = run(True, fused=True)
    v_u, nx_u, nf_u, mut_u = run(True, fused=False)
    assert (jax.tree_util.tree_structure(v_f)
            == jax.tree_util.tree_structure(v_u))
    np.testing.assert_array_equal(np.asarray(nx_f), np.asarray(nx_u))
    err = np.abs(np.asarray(nf_f, np.float32) - np.asarray(nf_u, np.float32))
    assert err.max() < 0.1, err.max()
    for a, b in zip(jax.tree_util.tree_leaves(mut_f),
                    jax.tree_util.tree_leaves(mut_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=5e-2)

    _, _, nf_fe, _ = run(False, fused=True)
    _, _, nf_ue, _ = run(False, fused=False)
    err = np.abs(np.asarray(nf_fe, np.float32)
                 - np.asarray(nf_ue, np.float32))
    assert err.max() < 0.1, err.max()


def test_fused_sa_supported_gate():
    assert fused_sa_supported((16, 128, 64, 128), [128, 128, 128])
    assert fused_sa_supported((16, 32, 64, 128), [128, 128, 256])
    assert not fused_sa_supported((16, 128, 64, 128), [128, 128])  # depth
    assert not fused_sa_supported((16, 128, 64, 96), [96, 128, 128])  # C1
    assert not fused_sa_supported((16, 128, 12, 128), [128, 128, 128])  # S
    assert not fused_sa_supported((16, 128, 64, 128), [64, 128, 128])  # mlp[0]
