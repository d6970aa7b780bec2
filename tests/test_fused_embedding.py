"""Equivalence pins for the whole-embedding Pallas kernel
(ops/fused_embedding.py + the ``set_embedding_backend`` routing in
models/embeddings.py).

The fused kernel is an execution-layout change only: every test here asserts
it against the flax conv/BN path on the SAME variable tree. Runs in Pallas
interpret mode on the CPU backend (conftest forces CPU), where the kernel's
dots are exact f32 — tolerances cover only reassociation differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import moleculardiffusion_mivit_tpu.models.embeddings as emb_mod
from moleculardiffusion_mivit_tpu.config import ModelConfig
from moleculardiffusion_mivit_tpu.models import GeneralTransformer, init_model
from moleculardiffusion_mivit_tpu.models.embeddings import DeepResNetEmbedding
from moleculardiffusion_mivit_tpu.ops.fused_embedding import (
    BN_LAYOUT,
    fused_deep_resnet_embed,
)


@pytest.fixture(autouse=True)
def _restore_backend():
    yield
    emb_mod.set_embedding_backend("auto")


def _gather(params):
    """Flax param tree → the kernel's argument dicts."""
    bn_map = {
        "bn1": params["bn1"],
        "rb1_bn1": params["res_block1"]["bn1"],
        "rb1_bn2": params["res_block1"]["bn2"],
        "rb1_skip": params["res_block1"]["skip_bn"],
        "rb2_bn1": params["res_block2"]["bn1"],
        "rb2_bn2": params["res_block2"]["bn2"],
        "rb2_skip": params["res_block2"]["skip_bn"],
    }
    kernels = {
        "initial": params["initial_conv"]["kernel"],
        "rb1_conv1": params["res_block1"]["conv1"]["kernel"],
        "rb1_conv2": params["res_block1"]["conv2"]["kernel"],
        "rb1_skip": params["res_block1"]["skip_conv"]["kernel"],
        "rb2_conv1": params["res_block2"]["conv1"]["kernel"],
        "rb2_conv2": params["res_block2"]["conv2"]["kernel"],
        "rb2_skip": params["res_block2"]["skip_conv"]["kernel"],
    }
    return (
        kernels,
        {k: v["scale"] for k, v in bn_map.items()},
        {k: v["bias"] for k, v in bn_map.items()},
        params["fc"]["kernel"],
        params["fc"]["bias"],
    )


def _setup(b=2, t=15, s=9, e=64, seed=0):
    x = jax.random.normal(jax.random.key(seed), (b, t, s, s), jnp.float32) * 0.3 + 0.1
    mod = DeepResNetEmbedding(patch_size=s, embed_dim=e)
    variables = mod.init(jax.random.key(seed + 1), x, train=True)
    return x, mod, variables


@pytest.mark.parametrize("b,t,s", [(2, 15, 9), (1, 30, 9), (1, 10, 13)])
def test_kernel_matches_flax_forward_and_stats(b, t, s):
    """Kernel forward == flax module forward (train mode), and the packed
    batch stats reproduce flax BatchNorm's EMA update exactly — for the
    bench shape (1, 30, 9), a non-multiple-of-8 row count, and the
    Framerate experiment's 13 px patch (trainSettingsFramerate.py:42)."""
    x, mod, variables = _setup(b, t, s)
    with jax.default_matmul_precision("highest"):
        ref, mut = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        got, bn_stats = fused_deep_resnet_embed(x, *_gather(variables["params"]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    bs = variables["batch_stats"]
    flat_ref = {
        "bn1": bs["bn1"],
        "rb1_bn1": bs["res_block1"]["bn1"],
        "rb1_bn2": bs["res_block1"]["bn2"],
        "rb1_skip": bs["res_block1"]["skip_bn"],
        "rb2_bn1": bs["res_block2"]["bn1"],
        "rb2_bn2": bs["res_block2"]["bn2"],
        "rb2_skip": bs["res_block2"]["skip_bn"],
    }
    flat_new = {
        "bn1": mut["batch_stats"]["bn1"],
        "rb1_bn1": mut["batch_stats"]["res_block1"]["bn1"],
        "rb1_bn2": mut["batch_stats"]["res_block1"]["bn2"],
        "rb1_skip": mut["batch_stats"]["res_block1"]["skip_bn"],
        "rb2_bn1": mut["batch_stats"]["res_block2"]["bn1"],
        "rb2_bn2": mut["batch_stats"]["res_block2"]["bn2"],
        "rb2_skip": mut["batch_stats"]["res_block2"]["skip_bn"],
    }
    for name, _ in BN_LAYOUT:
        m, v = bn_stats[name]
        np.testing.assert_allclose(
            np.asarray(0.9 * flat_ref[name]["mean"] + 0.1 * m),
            np.asarray(flat_new[name]["mean"]),
            rtol=1e-4, atol=1e-6, err_msg=f"{name} mean",
        )
        np.testing.assert_allclose(
            np.asarray(0.9 * flat_ref[name]["var"] + 0.1 * v),
            np.asarray(flat_new[name]["var"]),
            rtol=1e-4, atol=1e-6, err_msg=f"{name} var",
        )


def test_kernel_gradients_match_flax():
    """custom_vjp backward (recompute-in-VMEM) == jax.grad through the flax
    path, for every parameter AND the input."""
    x, mod, variables = _setup()
    params, bstats = variables["params"], variables["batch_stats"]

    def loss_ref(p, xx):
        out, _ = mod.apply(
            {"params": p, "batch_stats": bstats}, xx, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(out * jnp.cos(out * 0.1))

    def loss_fused(p, xx):
        out, _ = fused_deep_resnet_embed(xx, *_gather(p))
        return jnp.sum(out * jnp.cos(out * 0.1))

    with jax.default_matmul_precision("highest"):
        gr, gxr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
        gf, gxf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    ref_flat = jax.tree_util.tree_leaves_with_path(gr)
    fused_flat = {
        jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gf)
    }
    for k, v in ref_flat:
        np.testing.assert_allclose(
            np.asarray(fused_flat[jax.tree_util.keystr(k)]),
            np.asarray(v),
            rtol=5e-3, atol=5e-4, err_msg=jax.tree_util.keystr(k),
        )
    np.testing.assert_allclose(np.asarray(gxf), np.asarray(gxr), rtol=5e-3, atol=5e-4)


def test_backend_routing_identical_tree_and_outputs():
    """set_embedding_backend('fused') produces the same outputs, the same
    mutated batch_stats, and an IDENTICAL variable tree structure as the
    flax path — checkpoints and optimizer states interoperate."""
    x, mod, variables = _setup()

    def run(backend):
        emb_mod.set_embedding_backend(backend)
        with jax.default_matmul_precision("highest"):
            out, mut = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    o_x, bs_x = run("xla")
    o_f, bs_f = run("fused")
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_x), rtol=2e-4, atol=2e-4)
    assert jax.tree_util.tree_structure(bs_x) == jax.tree_util.tree_structure(bs_f)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(bs_x),
        jax.tree_util.tree_leaves_with_path(bs_f),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5, err_msg=str(kp)
        )


def test_backend_eval_mode_never_routes_fused():
    """train=False must stay on the flax path (running stats, no kernel)."""
    x, mod, variables = _setup()
    emb_mod.set_embedding_backend("fused")
    out_f = mod.apply(variables, x, train=False)
    emb_mod.set_embedding_backend("xla")
    out_x = mod.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_x))


def test_backend_vmem_row_guard_falls_back_to_xla():
    """Above FUSED_MAX_ROWS (the measured scoped-VMEM limit of the backward
    kernel on v5e, results/fused_embedding) an explicit 'fused' backend must
    warn once and take the XLA path bit-for-bit — the regime where the
    kernel measured uncompilable is unreachable."""
    x, mod, variables = _setup()
    b, t, s = x.shape[0], x.shape[1], x.shape[2]
    reps = emb_mod.FUSED_MAX_ROWS // (b * t * s * s) + 1
    big = jnp.tile(x, (reps, 1, 1, 1))
    assert big.shape[0] * t * s * s > emb_mod.FUSED_MAX_ROWS

    emb_mod.set_embedding_backend("fused")  # also resets the warned-rows set
    with pytest.warns(UserWarning, match="scoped-VMEM"):
        out_f, _ = mod.apply(variables, big, train=True, mutable=["batch_stats"])
    # once per row count: a second same-shape oversized call is silent
    import warnings as _w

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        mod.apply(variables, big, train=True, mutable=["batch_stats"])
    assert not [w for w in caught if "scoped-VMEM" in str(w.message)]
    # ... but a DIFFERENT oversized row count warns again (advisor round 4:
    # the old process-global flag silently swallowed every later oversize)
    bigger = jnp.tile(x, (reps + 1, 1, 1, 1))
    with pytest.warns(UserWarning, match="scoped-VMEM"):
        mod.apply(variables, bigger, train=True, mutable=["batch_stats"])
    emb_mod.set_embedding_backend("xla")
    out_x, _ = mod.apply(variables, big, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_x))

    # under the limit the explicit backend still routes to the kernel:
    # assert routing DIRECTLY via a call-counting wrapper around the kernel
    # entry point (advisor round 4: float non-equality was a brittle proxy)
    from moleculardiffusion_mivit_tpu.ops import fused_embedding as fe_mod

    calls = []
    real = fe_mod.fused_deep_resnet_embed

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    fe_mod.fused_deep_resnet_embed = counting
    try:
        emb_mod.set_embedding_backend("fused")
        mod.apply(variables, x, train=True, mutable=["batch_stats"])
        assert len(calls) == 1, "in-limit call must route to the fused kernel"
        mod.apply(variables, big, train=True, mutable=["batch_stats"])
        assert len(calls) == 1, "oversized call must NOT route to the kernel"
        emb_mod.set_embedding_backend("xla")
        mod.apply(variables, x, train=True, mutable=["batch_stats"])
        assert len(calls) == 1, "xla backend must never route to the kernel"
    finally:
        fe_mod.fused_deep_resnet_embed = real
        emb_mod.set_embedding_backend("auto")


@pytest.mark.slow
def test_full_transformer_grads_match_through_fused_path():
    """End contract: GeneralTransformer(deep_resnet) loss + grads match
    between backends, including under the stacked-pair vmap layout
    (train.multi) the batch-1 bench uses."""
    cfg = ModelConfig(use_pos_encoding=True, num_layers=2)
    model = GeneralTransformer(cfg, embedding="deep_resnet")
    x = jax.random.normal(jax.random.key(3), (2, 15, 9, 9), jnp.float32) * 0.3
    params, bstats = init_model(model, jax.random.key(4), x)
    target = jnp.full((2, 1), 2.0)

    def loss(p, xx):
        out, _ = model.apply(
            {"params": p, "batch_stats": bstats}, xx, train=True, mutable=["batch_stats"]
        )
        return jnp.mean((out - target) ** 2)

    with jax.default_matmul_precision("highest"):
        emb_mod.set_embedding_backend("xla")
        lx, gx = jax.value_and_grad(loss)(params, x)
        emb_mod.set_embedding_backend("fused")
        lf, gf = jax.value_and_grad(loss)(params, x)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4)
    ref_flat = jax.tree_util.tree_leaves_with_path(gx)
    fused_flat = {
        jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gf)
    }
    for k, v in ref_flat:
        # Per-tensor scaled tolerance (grads through 2 transformer layers
        # accumulate reassociation noise; the direct kernel-grad test above
        # pins the tight bound), allowing ≤0.01% relu tie-flips: a
        # pre-activation within float noise of 0.0 can land on opposite
        # sides of the relu boundary in the two layouts, flipping that one
        # element's gradient mask — inherent to ANY layout change.
        ref = np.asarray(v)
        got = np.asarray(fused_flat[jax.tree_util.keystr(k)])
        # 1e-6 floor: identically-vanishing grads (e.g. k_proj bias under
        # softmax shift-invariance) are pure float noise at ~1e-8
        tol = 1e-2 * np.abs(ref).max() + 1e-2 * np.abs(ref) + 1e-6
        bad = np.abs(got - ref) > tol
        assert bad.mean() <= 1e-4, (
            jax.tree_util.keystr(k),
            float(bad.mean()),
            float(np.abs(got - ref).max()),
        )

    # stacked-pair layout: vmap over (params, data)
    pstack = jax.tree.map(lambda v: jnp.stack([v, v * 1.01]), params)
    xstack = jnp.stack([x, x * 0.99])

    def one(p, xx):
        out, _ = model.apply(
            {"params": p, "batch_stats": bstats}, xx, train=True, mutable=["batch_stats"]
        )
        return out

    with jax.default_matmul_precision("highest"):
        emb_mod.set_embedding_backend("fused")
        o_f = jax.vmap(one)(pstack, xstack)
        emb_mod.set_embedding_backend("xla")
        o_x = jax.vmap(one)(pstack, xstack)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_x), rtol=2e-3, atol=2e-4)
