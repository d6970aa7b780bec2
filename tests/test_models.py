import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculardiffusion_mivit_tpu.config import ModelConfig
from moleculardiffusion_mivit_tpu.models import (
    GeneralTransformer,
    ModularTransformer,
    MultiImageFeatureResNet,
    MultiImageResNet,
    apply_model,
    get_transformer_models,
    init_model,
    param_count,
)

CFG = ModelConfig()
B, T, S = 3, 30, 9


@pytest.fixture(scope="module")
def videos():
    return jax.random.normal(jax.random.key(0), (B, T, S, S))


@pytest.fixture(scope="module")
def features():
    return jax.random.normal(jax.random.key(1), (B, 25))


@pytest.mark.parametrize("embedding", ["linear", "cnn", "deep_resnet"])
def test_general_transformer_shapes(videos, embedding):
    model = GeneralTransformer(CFG, embedding=embedding)
    params, bstats = init_model(model, jax.random.key(2), videos)
    out, _ = apply_model(model, params, bstats, videos)
    assert out.shape == (B, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_general_transformer_fusion(videos, features):
    for fusion in ("early", "late"):
        model = GeneralTransformer(
            CFG, use_global_features=True, fusion_type=fusion, global_feature_dim=25
        )
        params, bstats = init_model(model, jax.random.key(3), videos, features)
        out, _ = apply_model(model, params, bstats, videos, features)
        assert out.shape == (B, 1)
    # late fusion head sees 2*embed_dim inputs
    late = GeneralTransformer(CFG, use_global_features=True, fusion_type="late", global_feature_dim=25)
    p, _ = init_model(late, jax.random.key(3), videos, features)
    assert p["mlp_head"]["fc1"]["kernel"].shape[0] == 2 * CFG.embed_dim


def test_sequence_mode_per_frame_predictions(videos):
    cfg = CFG.replace(use_regression_token=False, single_prediction=False, use_pos_encoding=True)
    model = GeneralTransformer(cfg, embedding="linear")
    params, bstats = init_model(model, jax.random.key(4), videos)
    out, _ = apply_model(model, params, bstats, videos)
    assert out.shape == (B, T, 1)


def test_multi_image_resnet(videos):
    model = MultiImageResNet(single_prediction=True)
    params, bstats = init_model(model, jax.random.key(5), videos)
    out, _ = apply_model(model, params, bstats, videos)
    assert out.shape == (B, 1)
    model2 = MultiImageResNet(single_prediction=False)
    params2, bstats2 = init_model(model2, jax.random.key(5), videos)
    out2, _ = apply_model(model2, params2, bstats2, videos)
    assert out2.shape == (B, T, 1)


def test_multi_image_feature_resnet(videos, features):
    model = MultiImageFeatureResNet(external_dim=25, feature_size=64, hidden_size=128)
    params, bstats = init_model(model, jax.random.key(6), videos, features)
    out, _ = apply_model(model, params, bstats, videos, features)
    assert out.shape == (B, 1)


def test_modular_transformer_modes(videos):
    per_frame_features = jax.random.normal(jax.random.key(7), (B, T, 25))
    for mode, fusion in [
        ("images_only", "add"),
        ("features_only", "add"),
        ("both", "add"),
        ("both", "concat_proj"),
        ("both", "concat_features"),
    ]:
        model = ModularTransformer(
            CFG, mode=mode, features_dim=25, fusion_method=fusion, image_embedding="linear"
        )
        args = {
            "images_only": (videos,),
            "features_only": (None, per_frame_features),
            "both": (videos, per_frame_features),
        }[mode]
        params, bstats = init_model(model, jax.random.key(8), *args)
        out, _ = apply_model(model, params, bstats, *args)
        assert out.shape == (B, 1), (mode, fusion)


def test_batch_stats_update_in_train_mode(videos):
    model = GeneralTransformer(CFG, embedding="deep_resnet")
    params, bstats = init_model(model, jax.random.key(9), videos)
    _, new_bstats = apply_model(model, params, bstats, videos, train=True)
    old = jax.tree.leaves(bstats)
    new = jax.tree.leaves(new_bstats)
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_get_transformer_models_registry(videos):
    models = get_transformer_models(CFG, "_s")
    assert set(models) == {"linear_2layer_s", "cnn_2layer_s", "deepcnn_2layer_s"}


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference not mounted")
def test_param_counts_match_reference_torch_models(videos, features):
    """Instantiate the actual torch reference models (read-only) and compare
    learnable parameter counts exactly."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from helpers import models as tm
    finally:
        sys.path.remove("/root/reference")
    import torch.nn.functional as F

    def tcount(m):
        return sum(p.numel() for p in m.parameters())

    embed_kwargs = {"patch_size": S, "embed_dim": CFG.embed_dim}
    pairs = []
    for emb_name, emb_cls in [
        ("linear", tm.LinearProjectionEmbedding),
        ("cnn", tm.CNNEmbedding),
        ("deep_resnet", tm.DeepResNetEmbedding),
    ]:
        ref = tm.GeneralTransformer(
            embedding_cls=emb_cls,
            embed_kwargs=embed_kwargs,
            embed_dim=CFG.embed_dim,
            num_heads=CFG.num_heads,
            hidden_dim=CFG.hidden_dim,
            num_layers=CFG.num_layers,
            mlp_head=tm.MLPHead,
            tr_activation_fct=F.relu,
            dropout=0.0,
            use_pos_encoding=False,
            use_regression_token=True,
            single_prediction=True,
        )
        ours = GeneralTransformer(CFG, embedding=emb_name)
        params, _ = init_model(ours, jax.random.key(0), videos)
        pairs.append((emb_name, tcount(ref), param_count(params)))

    ref_res = tm.MultiImageResNet(S, single_prediction=True)
    ours_res = MultiImageResNet()
    params, _ = init_model(ours_res, jax.random.key(0), videos)
    pairs.append(("resnet", tcount(ref_res), param_count(params)))

    ref_ft = tm.MultiImageFeatureResNet(S, 25, feature_size=64, hidden_size=128)
    ours_ft = MultiImageFeatureResNet(external_dim=25)
    params, _ = init_model(ours_ft, jax.random.key(0), videos, features)
    pairs.append(("resnet_ft", tcount(ref_ft), param_count(params)))

    mismatches = [(n, r, o) for n, r, o in pairs if r != o]
    assert not mismatches, f"param count mismatches (name, ref, ours): {mismatches}"


def test_single_batch_overfit():
    """A tiny GeneralTransformer must overfit 4 sequences quickly — training
    dynamics smoke test."""
    import optax

    cfg = ModelConfig(num_layers=2, embed_dim=32, hidden_dim=64)
    model = GeneralTransformer(cfg, embedding="linear")
    x = jax.random.normal(jax.random.key(0), (4, 10, 9, 9))
    y = jnp.array([[0.1], [0.3], [0.5], [0.7]])
    params, bstats = init_model(model, jax.random.key(1), x)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, x, train=False)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])


def test_hybrid_fusion_transformer(videos):
    """Both fusion pathways in one model: packed (B, T*n_pf + 25) features
    unpack into per-frame tokens + a global reg-token injection; output is
    a single prediction per sequence; bad packing raises."""
    from moleculardiffusion_mivit_tpu.models import HybridFusionTransformer

    n_pf, n_g = 6, 25
    packed = jax.random.normal(jax.random.key(2), (B, T * n_pf + n_g))
    for fusion in ("concat_proj", "add"):
        model = HybridFusionTransformer(
            CFG, per_frame_dim=n_pf, global_dim=n_g, fusion_method=fusion
        )
        params, bstats = init_model(model, jax.random.key(3), videos, packed)
        out, _ = apply_model(model, params, bstats, videos, packed)
        assert out.shape == (B, 1)
        assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="packed features"):
        model = HybridFusionTransformer(CFG, per_frame_dim=n_pf, global_dim=n_g)
        init_model(model, jax.random.key(3), videos, packed[:, :-1])


def test_hybrid_sequence_mode_per_frame_predictions(videos):
    """single_prediction=False (round 5): one prediction per FRAME token —
    the reg token rides along as global context but emits none — so the
    hybrid enters the changepoint detection study."""
    from moleculardiffusion_mivit_tpu.models import HybridFusionTransformer

    n_pf, n_g = 6, 25
    packed = jax.random.normal(jax.random.key(2), (B, T * n_pf + n_g))
    cfg = CFG.replace(single_prediction=False, use_pos_encoding=True)
    model = HybridFusionTransformer(cfg, per_frame_dim=n_pf, global_dim=n_g)
    params, bstats = init_model(model, jax.random.key(3), videos, packed)
    out, _ = apply_model(model, params, bstats, videos, packed)
    assert out.shape == (B, T, 1)
    assert np.isfinite(np.asarray(out)).all()
    # the global features really reach every per-frame prediction
    packed2 = packed.at[:, -n_g:].add(1.0)
    out2, _ = apply_model(model, params, bstats, videos, packed2)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-6
