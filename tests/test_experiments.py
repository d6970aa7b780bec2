import numpy as np
import pytest

import jax

from moleculardiffusion_mivit_tpu.experiments import REGISTRY, get_experiment


def _assert_ran(exp, expected_models, n_cycles):
    states, history = exp.run(num_cycles=n_cycles)
    assert set(history) == set(expected_models)
    for name, h in history.items():
        assert len(h["val_avg"]) == n_cycles
        assert np.isfinite(h["val_avg"]).all(), name


def test_registry_complete():
    assert set(REGISTRY) == {
        "baseline",
        "psfnoise",
        "framerate",
        "embeddings",
        "images_features",
        "denoising",
        "modular",
    }


def test_baseline_experiment_smoke():
    exp = get_experiment(
        "baseline", sequences_per_d=8, val_length=6, try_leaky_relu=False
    )
    expected = {"linear_2layer_s", "cnn_2layer_s", "deepcnn_2layer_s", "resnet"}
    _assert_ran(exp, expected, 1)


@pytest.mark.slow
def test_aot_cached_cycle_matches_jit(tmp_path, monkeypatch):
    """Experiment.aot_cache (round 5): the fused cycle served from
    serialized AOT executables must train identically to the jitted path,
    and a fresh identical experiment must HIT the on-disk cache. (Default
    on only for accelerator backends; enabled explicitly here on CPU.)"""
    import os

    monkeypatch.setenv("MIVIT_AOT_CACHE_DIR", str(tmp_path))

    def build():
        exp = get_experiment(
            "baseline", sequences_per_d=8, val_length=6, try_leaky_relu=False
        )
        exp.precompile_schedule = False
        return exp

    exp_jit = build()
    exp_jit.aot_cache = False
    _, hist_jit = exp_jit.run(num_cycles=2)

    exp_aot = build()
    exp_aot.aot_cache = True
    _, hist_aot = exp_aot.run(num_cycles=2)
    assert exp_aot.aot_cache, "AOT path must not have fallen back to jit"
    blobs = [f for f in os.listdir(tmp_path) if f.endswith(".aot")]
    assert blobs, "fused-cycle executable was not persisted"
    for name in hist_jit:
        np.testing.assert_array_equal(
            np.asarray(hist_jit[name]["val_avg"]),
            np.asarray(hist_aot[name]["val_avg"]),
            err_msg=name,
        )

    # third run, same program: served from disk (no new blob, same history)
    exp_hit = build()
    exp_hit.aot_cache = True
    _, hist_hit = exp_hit.run(num_cycles=2)
    assert sorted(os.listdir(tmp_path)) == sorted(blobs + [])
    for name in hist_jit:
        np.testing.assert_array_equal(
            np.asarray(hist_jit[name]["val_avg"]),
            np.asarray(hist_hit[name]["val_avg"]),
            err_msg=name,
        )


@pytest.mark.slow
def test_baseline_sequence_mode_smoke():
    exp = get_experiment(
        "baseline", sequences_per_d=8, val_length=12, sequences=True, try_leaky_relu=False
    )
    _assert_ran(exp, {"linear_2layer_s", "cnn_2layer_s", "deepcnn_2layer_s", "resnet"}, 1)


@pytest.mark.slow
def test_psfnoise_experiment_smoke():
    exp = get_experiment(
        "psfnoise",
        sequences_per_d=8,
        val_length=6,
        psf_settings=(2.0, 1.0),
        noise_settings=(0.0, 0.1),
        val_d_values=(1.0, 5.0),
    )
    expected = {f"{p}_{i}_{j}" for p in ("tr", "res") for i in range(2) for j in range(2)}
    _assert_ran(exp, expected, 1)


@pytest.mark.slow
def test_framerate_experiment_smoke():
    exp = get_experiment(
        "framerate", sequences_per_d=8, val_length=6, rates=(5, 10), val_d_values=(1.0, 5.0)
    )
    _assert_ran(exp, {"tr_0", "res_0", "tr_1", "res_1"}, 1)


@pytest.mark.slow
def test_embeddings_experiment_smoke_and_param_counts():
    from moleculardiffusion_mivit_tpu.experiments.embeddings import param_counts

    exp = get_experiment("embeddings", sequences_per_d=8, val_length=6, val_d_values=(1.0, 5.0))
    exp.build()
    counts = param_counts(exp)
    assert len(counts) == 10
    # big variant must be bigger than normal, which is bigger than small
    assert counts["linear_2layer_b"] > counts["linear_2layer_n"] > counts["linear_2layer_s"]
    _assert_ran(exp, set(counts), 1)


@pytest.mark.slow
def test_images_features_experiment_smoke():
    exp = get_experiment(
        "images_features", sequences_per_d=8, val_length=6, val_d_values=(1.0, 5.0)
    )
    expected = {
        "im_tr",
        "im_ft_early_tr",
        "im_ft_late_tr",
        "im_resnet",
        "im_ft_resnet",
        "ft_mlp",
        "MSD_Perfect",
        "MSD_Frame",
        "MSD_Localized",
    }
    _assert_ran(exp, expected, 1)
    # MSD_Perfect on raw (scaled) trajectories should be close to truth:
    # MSD(tau=1) of raw trajectory (unit-scaled /100) x 250 ≈ D.
    h = exp.history["MSD_Perfect"]
    assert h["val_5"][-1] < 6.0  # rough calibration sanity


@pytest.mark.slow
def test_denoising_experiment_smoke():
    exp = get_experiment(
        "denoising", sequences_per_d=8, val_length=6, val_d_values=(1.0, 5.0)
    )
    assert exp.train_cfg.loss == "l1"
    assert exp.train_cfg.num_cycles == 10
    expected = {
        f"{p}_{s}"
        for p in ("trans", "resnet")
        for s in (
            "no_noise",
            "gaussian_noise",
            "poisson_noise",
            "gauss_filter",
            "RL_2",
            "RL_5",
            "RL_10",
        )
    }
    _assert_ran(exp, expected, 1)


def test_experiment_checkpoint_roundtrip(tmp_path):
    from moleculardiffusion_mivit_tpu.utils import restore_experiment, save_experiment

    exp = get_experiment(
        "baseline", sequences_per_d=8, val_length=6, try_leaky_relu=False
    )
    exp.run(num_cycles=1)
    save_experiment(exp, str(tmp_path / "ckpt"))

    exp2 = get_experiment(
        "baseline", sequences_per_d=8, val_length=6, try_leaky_relu=False
    )
    exp2.build()
    restore_experiment(exp2, str(tmp_path / "ckpt"))
    assert exp2.history == exp.history
    a = jax.tree.leaves(exp.states["resnet"].params)[0]
    b = jax.tree.leaves(exp2.states["resnet"].params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_resume_continues_schedule(tmp_path):
    """Save at cycle k, restore, continue with start_cycle — history grows
    and the schedule index advances (batch/LR follow the global cycle)."""
    from moleculardiffusion_mivit_tpu.utils import restore_experiment, save_experiment

    exp = get_experiment("baseline", sequences_per_d=8, val_length=6, try_leaky_relu=False)
    exp.run(num_cycles=2)
    save_experiment(exp, str(tmp_path / "ck"))

    exp2 = get_experiment("baseline", sequences_per_d=8, val_length=6, try_leaky_relu=False)
    exp2.build()
    restore_experiment(exp2, str(tmp_path / "ck"))
    done = len(exp2.history["resnet"]["val_avg"])
    assert done == 2
    exp2.run(num_cycles=1, start_cycle=done)
    assert len(exp2.history["resnet"]["val_avg"]) == 3


@pytest.mark.slow
def test_modular_experiment_smoke():
    """The ModularTransformer regime (models.py:366-593 — the reference built
    it but never trained it): all five mode × fusion arms train and
    validate, including features_only and concat_features (round 3)."""
    exp = get_experiment("modular", sequences_per_d=8, val_length=6)
    _assert_ran(
        exp,
        {
            "mod_images",
            "mod_features",
            "mod_both_add",
            "mod_both_concat",
            "mod_both_concat_feat",
        },
        1,
    )


@pytest.mark.slow
def test_images_features_in_order_predictions_and_tables():
    """The reconciled in-order sweep: 100 D values (0.1..10.0), per-model
    (n_d, n_particles) predictions in physical units, and error tables
    derived from them consistently."""
    exp = get_experiment(
        "images_features",
        sequences_per_d=8,
        val_length=6,
        val_d_values=(1.0, 5.0),
        with_in_order=True,
    )
    exp.run(num_cycles=1)
    d_values = exp.in_order_data["d_values"]
    assert len(d_values) == 100 and float(d_values[-1]) == 10.0
    preds = exp.in_order_predictions()
    assert set(preds) == set(exp.model_names)
    for p in preds.values():
        assert p.shape == (100, 10) and np.isfinite(p).all()
    tables = exp.in_order_error_tables()
    # tables recompute from the same predictions
    err = preds["MSD_Frame"] - np.asarray(d_values)[:, None]
    assert abs(tables["MSD_Frame"]["mse"] - float((err**2).mean())) < 1e-6

    # multi-render scoring: identical trajectories, fresh render noise.
    # The first (protocol) render's mse is preserved; the render-mean/std
    # summarize the draws; MSD arms see a nonzero-but-small render spread
    # while the trajectory suite itself stays fixed.
    t2 = exp.in_order_error_tables(n_renders=3)
    for name in exp.model_names:
        assert t2[name]["mse"] == tables[name]["mse"]
        assert len(t2[name]["mse_renders"]) == 3
        assert t2[name]["mse_renders"][0] == round(tables[name]["mse"], 5)
        assert np.isfinite(t2[name]["mse_render_mean"])
        assert 0.0 <= t2[name]["mse_render_std"] < 0.5 * t2[name]["mse_render_mean"] + 1e-9
    # MSD_Perfect scores the oracle sub-positions, which do not depend on
    # the render at all - its spread must be exactly zero
    assert t2["MSD_Perfect"]["mse_render_std"] == 0.0


def test_images_features_rejects_unknown_in_order_suite():
    """A typo'd suite name must raise, not silently score the wrong
    protocol (the committed 70-value sweep vs the reconciled 100-value
    published one differ by ~2x on the MSD rows)."""
    import pytest

    with pytest.raises(ValueError, match="in_order_suite"):
        get_experiment(
            "images_features",
            sequences_per_d=2,
            val_length=6,
            val_d_values=(1.0,),
            with_in_order=True,
            in_order_suite="imtf",
        )


def test_per_frame_features_causal_and_shaped():
    import jax.numpy as jnp

    from moleculardiffusion_mivit_tpu.features import (
        N_PER_FRAME_FEATURES,
        compute_per_frame_features,
    )

    key = jax.random.key(0)
    trajs = jax.random.normal(key, (4, 12, 2))
    f = compute_per_frame_features(trajs)
    assert f.shape == (4, 12, N_PER_FRAME_FEATURES)
    assert np.isfinite(np.asarray(f)).all()
    # causality: changing the tail must not affect earlier tokens
    trajs2 = trajs.at[:, 8:].add(100.0)
    f2 = compute_per_frame_features(trajs2)
    np.testing.assert_allclose(np.asarray(f[:, :8]), np.asarray(f2[:, :8]), rtol=1e-5)
    # frame 0 has zero displacement features
    np.testing.assert_allclose(np.asarray(f[:, 0, :3]), 0.0, atol=1e-6)
    # running_msd1 at the last frame ~ 4D estimate scale (sanity: positive)
    assert (np.asarray(f[:, -1, 3]) > 0).all()


@pytest.mark.slow
def test_fused_merged_scan_matches_unmerged():
    """Inside the SAME fused one-program-per-cycle structure, merging all
    arms' epochs into one ``lax.scan`` must reproduce the one-scan-per-arm
    variant: identical generation tracing, identical key derivation
    (fold_in(k_train, arm_index) → split), so the only difference is loop
    structure — tolerances are float-reassociation-level.  (Comparing against
    the per-arm *dispatch* path instead is not bit-stable: generation traced
    inside vs outside the program differs in low bits, which ~44 batch-1
    AdamW steps amplify to ~1e-3.)"""

    def make():
        return get_experiment(
            "psfnoise",
            sequences_per_d=8,
            val_length=6,
            psf_settings=(2.0, 1.0),
            noise_settings=(0.0, 0.1),
            val_d_values=(1.0, 5.0),
        )

    exp_merged = make()
    exp_merged.merge_scans = True
    exp_unmerged = make()
    exp_unmerged.merge_scans = False
    exp_merged.build(jax.random.key(42))
    exp_unmerged.build(jax.random.key(42))
    exp_merged.run(num_cycles=1)
    exp_unmerged.run(num_cycles=1)
    for arm_name in exp_merged.states:
        a = jax.tree.leaves(exp_merged.states[arm_name].params)
        b = jax.tree.leaves(exp_unmerged.states[arm_name].params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=1e-6, rtol=1e-5, err_msg=arm_name
            )


def test_grid_train_step_matches_train_cycle():
    """GridImpls.train_step + make_perms scanned manually must reproduce
    GridImpls.train_cycle exactly on FIXED input data (same jit boundary
    semantics, so this is a precise structural check of the merged-scan
    machinery: permutations, dropout keys, LR injection)."""
    import jax.numpy as jnp

    from moleculardiffusion_mivit_tpu.config import (
        BASELINE_OPTICS,
        ModelConfig,
        TrainConfig,
    )
    from moleculardiffusion_mivit_tpu.models import GeneralTransformer
    from moleculardiffusion_mivit_tpu.train.grid import make_grid_impls
    from moleculardiffusion_mivit_tpu.train.loop import generate_cycle_data

    cfg = TrainConfig(
        sequences_per_d=8,
        training_ds=((1, 1), (5, 1)),
        n_frames=6,
        n_pos_per_frame=5,
    )
    model = GeneralTransformer(
        ModelConfig(patch_size=9, embed_dim=32, num_heads=4, hidden_dim=64,
                    num_layers=2, dropout=0.1),
        embedding="linear",
    )
    impls = make_grid_impls(model, cfg)
    videos, labels, _ = generate_cycle_data(jax.random.key(0), cfg, BASELINE_OPTICS)
    m, bsz = 2, 4
    videos_m = jnp.stack([videos, videos[::-1]])
    labels_m = jnp.stack([labels, labels[::-1]])
    grid = impls.init_grid(jax.random.key(1), m, videos[:1])
    key, lr = jax.random.key(2), jnp.float32(1e-4)

    ref_grid, ref_losses = jax.jit(impls.train_cycle, static_argnames=("batch_size",))(
        grid, videos_m, labels_m, None, key, lr, bsz
    )

    @jax.jit
    def merged(grid):
        perms, dks = impls.make_perms(key, m, videos.shape[0], bsz)

        def body(g, idx):
            g, losses = impls.train_step(g, videos_m, labels_m, None, idx, dks, lr)
            return g, losses

        return jax.lax.scan(body, grid, jnp.swapaxes(perms, 0, 1))

    got_grid, got_losses = merged(grid)
    np.testing.assert_allclose(
        np.asarray(got_losses.mean(0)), np.asarray(ref_losses), rtol=1e-5, atol=1e-7
    )
    for x, y in zip(jax.tree.leaves(ref_grid.params), jax.tree.leaves(got_grid.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_precompile_schedule_preserves_results():
    """Speculative background compilation of future batch regimes
    (Experiment._start_precompile) must not change training: histories match
    a run with precompilation disabled exactly (the warmer only touches
    throwaway zero states)."""

    def make():
        exp = get_experiment(
            "psfnoise",
            sequences_per_d=8,
            val_length=6,
            psf_settings=(2.0,),
            noise_settings=(0.0,),
            val_d_values=(1.0, 5.0),
        )
        # force a batch-regime change inside a short run
        exp.train_cfg = exp.train_cfg.replace(
            adaptive_batch_size=2, initial_batch_size=2
        )
        return exp

    exp_a = make()
    exp_b = make()
    exp_b.precompile_schedule = False
    exp_a.build(jax.random.key(1))
    exp_b.build(jax.random.key(1))
    exp_a.run(num_cycles=4)
    exp_b.run(num_cycles=4)
    for name in exp_a.history:
        np.testing.assert_allclose(
            exp_a.history[name]["val_avg"], exp_b.history[name]["val_avg"], rtol=1e-6
        )


@pytest.mark.slow
def test_experiment_stack_pairs_matches_unstacked():
    """``Experiment.stack_pairs`` is an execution-layout change inside the
    fused cycle only: the baseline's 3 relu/leaky pairs train as vmapped
    stacks, but states/evaluation/history/checkpoints keep the per-arm
    layout. Unstacked arms (resnet) must be BIT-identical — the stacking
    neither perturbs their keys (fold_in by original arm index) nor their
    data; stacked members match within the Adam early-step amplification of
    batched-GEMM reassociation (same tolerance rationale as
    tests/test_train.py::test_multi_cycle_stack_pairs_matches_unstacked)."""

    def make():
        return get_experiment(
            "baseline", sequences_per_d=2, val_length=6, val_d_values=(1.0, 5.0)
        )

    exps = {}
    with jax.default_matmul_precision("float32"):
        for sp in (False, True):
            exp = make()
            exp.stack_pairs = sp
            exp.build(jax.random.key(42))
            exp.run(num_cycles=2)
            exps[sp] = exp
    e0, e1 = exps[False], exps[True]
    assert not e0._stack_groups and len(e1._stack_groups) == 3
    assert set(e0.states) == set(e1.states)  # per-arm layout preserved
    for name in e0.states:
        a = jax.tree.leaves(e0.states[name].params)
        b = jax.tree.leaves(e1.states[name].params)
        if name == "resnet":
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        else:
            for x, y in zip(a, b):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), atol=20 * 1e-4, err_msg=name
                )
        np.testing.assert_allclose(
            e0.history[name]["val_avg"],
            e1.history[name]["val_avg"],
            rtol=0.05,
            err_msg=name,
        )


@pytest.mark.slow
def test_psfnoise_reconciled_in_order_suite():
    """PSFNoise also scores on the reconciled 100-value sweep: the
    reference's own loader reshapes the in-order render to
    (len(val_d_in_order)=100, 10, ...) (trainSettingsPSFNoise.py:128,
    159-160), which the committed 70-slice asset cannot satisfy — the
    published grid CSV therefore used the lost 100-value suite."""
    import pytest

    exp = get_experiment(
        "psfnoise",
        sequences_per_d=4,
        val_length=6,
        psf_settings=(2.0, 1.0),
        noise_settings=(0.0, 0.1),
        val_d_values=(1.0,),
        with_in_order=True,
    )
    d_values = exp.in_order_data["d_values"]
    assert len(d_values) == 100 and float(d_values[-1]) == 10.0
    # grid render carries the (N, P, Noise, F, S, S) layout for 1000 seqs
    assert exp.in_order_data["videos"].shape[:3] == (1000, 2, 2)
    exp.run(num_cycles=1)
    preds = exp.in_order_predictions()
    assert set(preds) == set(exp.model_names)
    for p in preds.values():
        assert p.shape == (100, 10) and np.isfinite(p).all()

    with pytest.raises(ValueError, match="in_order_suite"):
        get_experiment(
            "psfnoise",
            sequences_per_d=2,
            val_length=6,
            psf_settings=(2.0,),
            noise_settings=(0.0,),
            val_d_values=(1.0,),
            with_in_order=True,
            in_order_suite="typo",
        )
