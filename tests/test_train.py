import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS, ModelConfig, TrainConfig
from moleculardiffusion_mivit_tpu.evaluation import (
    generate_frozen_validation,
    render_validation_videos,
)
from moleculardiffusion_mivit_tpu.models import GeneralTransformer, MultiImageResNet
from moleculardiffusion_mivit_tpu.train import (
    make_grid_train_fns,
    run_training,
)
from moleculardiffusion_mivit_tpu.train.loop import generate_cycle_data, mix_trajectory_tails

SMALL_TRAIN = TrainConfig(
    num_cycles=5,
    sequences_per_d=16,
    training_ds=((1, 1), (5, 1)),
    adaptive_batch_size=-1,
    fixed_batch_size=16,
    n_frames=10,
    n_pos_per_frame=5,
    seed=0,
)
SMALL_MODEL = ModelConfig(patch_size=9, embed_dim=32, num_heads=4, hidden_dim=64, num_layers=2)


def test_generate_cycle_data_shapes():
    videos, labels, feats = generate_cycle_data(
        jax.random.key(0), SMALL_TRAIN, BASELINE_OPTICS
    )
    assert videos.shape == (32, 10, 9, 9)
    assert labels.shape == (32, 1)
    assert feats is None
    y = np.asarray(labels) * SMALL_TRAIN.d_max_normalization
    # first class ~ N(1,1) truncated, second ~ N(5,1): class means separated
    assert y[:16].mean() < y[16:].mean()


def test_generate_cycle_data_sequence_mode():
    cfg = SMALL_TRAIN.replace(sequence_mode=True)
    videos, labels, _ = generate_cycle_data(jax.random.key(0), cfg, BASELINE_OPTICS)
    assert labels.shape == (32, 10)
    # constant-D trajectories → identical label at every frame
    l = np.asarray(labels)
    np.testing.assert_allclose(l, np.broadcast_to(l[:, :1], l.shape), rtol=1e-6)


def test_mix_trajectory_tails():
    key = jax.random.key(1)
    # f=30 keeps the reference's split range [10, 20) strictly inside the
    # sequence so heads are guaranteed unchanged.
    n_classes, n_per, f = 4, 8, 30
    videos = jnp.broadcast_to(
        jnp.arange(n_classes, dtype=jnp.float32)[:, None, None, None, None],
        (n_classes, n_per, f, 3, 3),
    ).reshape(n_classes * n_per, f, 3, 3)
    labels = jnp.broadcast_to(
        jnp.arange(n_classes, dtype=jnp.float32)[:, None, None], (n_classes, n_per, f)
    ).reshape(n_classes * n_per, f)
    mv, ml = mix_trajectory_tails(key, videos, labels, n_classes, f)
    ml = np.asarray(ml)
    # Some sequences must now contain a transition (two distinct labels)
    n_mixed = sum(len(np.unique(row)) > 1 for row in ml)
    assert n_mixed > 0
    # Heads unchanged: first frame label equals original class
    np.testing.assert_allclose(ml[:, 0], np.asarray(labels)[:, 0])
    # Label/video consistency: video value equals label value everywhere
    np.testing.assert_allclose(np.asarray(mv)[:, :, 0, 0], ml)


def test_run_training_val_mse_improves():
    """v0 end-to-end: tiny MiViT, on-device generation, val MSE drops."""
    fixtures = generate_frozen_validation(
        seed=9, d_values=(1, 5), n_particles=16, t_steps=50, in_order_particles=2
    )
    fixtures.pop("valTrajsInOrder")
    vids = render_validation_videos(fixtures, SMALL_TRAIN, BASELINE_OPTICS)
    val_videos = {1.0: vids["val1"], 5.0: vids["val5"]}
    model = GeneralTransformer(SMALL_MODEL, embedding="linear")
    state, history = run_training(
        model, SMALL_TRAIN, BASELINE_OPTICS, val_videos, num_cycles=5
    )
    assert len(history["val_avg"]) == 5
    assert history["val_avg"][-1] < history["val_avg"][0]
    # a couple of cycles should already beat the trivial predict-0 MSE (13)
    assert history["val_avg"][-1] < 13.0


def test_grid_training_two_models():
    init_grid, train_cycle, evaluate = make_grid_train_fns(
        MultiImageResNet(), SMALL_TRAIN
    )
    videos, labels, _ = generate_cycle_data(jax.random.key(0), SMALL_TRAIN, BASELINE_OPTICS)
    m = 2
    videos_m = jnp.stack([videos, videos * 0.5])  # each model its own data slice
    labels_m = jnp.stack([labels, labels])
    grid = init_grid(jax.random.key(1), m, videos[:1])
    grid2, losses = train_cycle(
        grid, videos_m, labels_m, None, jax.random.key(2), jnp.float32(1e-4), 16
    )
    assert losses.shape == (m,)
    assert np.isfinite(np.asarray(losses)).all()
    # models diverged (different data slices)
    p0 = jax.tree.leaves(grid2.params)[0]
    assert not np.allclose(np.asarray(p0[0]), np.asarray(p0[1]))
    preds = evaluate(grid2, videos_m)
    assert preds.shape == (m, videos.shape[0], 1)


@pytest.mark.slow
def test_multi_cycle_merged_scan_matches_per_model():
    """The fused multi-model cycle (ONE merged scan stepping every model,
    train.multi) must reproduce the per-model train_cycle update sequence
    bit-for-bit: identical key derivation (fold_in(k_train, i) -> split),
    identical permutations, identical dropout keys."""
    from moleculardiffusion_mivit_tpu.train.loop import make_train_impls
    from moleculardiffusion_mivit_tpu.train.multi import make_multi_cycle

    models = {
        "tr": GeneralTransformer(SMALL_MODEL.replace(dropout=0.1), embedding="linear"),
        "res": MultiImageResNet(),
    }
    key = jax.random.key(7)
    videos, labels, _ = generate_cycle_data(key, SMALL_TRAIN, BASELINE_OPTICS)

    init_states, cycle = make_multi_cycle(
        models, SMALL_TRAIN, BASELINE_OPTICS, merge_scans=True
    )
    states = init_states(jax.random.key(1), videos[:1])
    # reference: run each model's own train_cycle with the same derived keys
    k_gen, k_train = jax.random.split(jax.random.key(3))
    ref_videos, ref_labels, _ = generate_cycle_data(k_gen, SMALL_TRAIN, BASELINE_OPTICS)
    ref_states = {}
    for i, name in enumerate(models):
        impls = make_train_impls(models[name], SMALL_TRAIN)
        st, _ = jax.jit(impls.train_cycle, static_argnames=("batch_size",))(
            states[name],
            ref_videos,
            ref_labels,
            None,
            jax.random.fold_in(k_train, i),
            jnp.float32(1e-4),
            8,
        )
        ref_states[name] = st

    new_states, losses, _ = cycle(states, jax.random.key(3), jnp.float32(1e-4), 8)
    for name in models:
        ref_leaves = jax.tree.leaves(ref_states[name].params)
        got_leaves = jax.tree.leaves(new_states[name].params)
        for a, b in zip(ref_leaves, got_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        assert np.isfinite(float(losses[name]))


@pytest.mark.parametrize("stack_pairs", [False, True])
@pytest.mark.slow
def test_scanned_multi_cycle_matches_sequential_dispatches(stack_pairs):
    """K cycles fused into one dispatch (make_scanned_multi_cycle: lax.scan
    over per-cycle key/LR) must reproduce K sequential fused-cycle dispatches
    exactly — same states, same per-cycle losses and val MSEs. The
    stack_pairs=True case pins the bench.py configuration (bench drives the
    scanned builder with pair-stacking on): the relu/leaky pair trains as one
    vmapped stack inside both programs."""
    from moleculardiffusion_mivit_tpu.train.multi import (
        make_multi_cycle,
        make_scanned_multi_cycle,
    )

    models = {
        "tr": GeneralTransformer(SMALL_MODEL.replace(dropout=0.1), embedding="linear"),
        "res": MultiImageResNet(),
    }
    if stack_pairs:
        models["tr_leaky"] = GeneralTransformer(
            SMALL_MODEL.replace(dropout=0.1, activation="leaky_relu"),
            embedding="linear",
        )
    key = jax.random.key(11)
    videos, _, _ = generate_cycle_data(key, SMALL_TRAIN, BASELINE_OPTICS)
    val_videos = videos[:6]
    val_targets = jnp.ones((6, 1), jnp.float32)

    k_cycles = [jax.random.fold_in(key, 100 + c) for c in range(3)]
    lrs = [1e-4, 9e-5, 8e-5]

    init_states, cycle = make_multi_cycle(
        models, SMALL_TRAIN, BASELINE_OPTICS, stack_pairs=stack_pairs
    )
    ref_states = init_states(jax.random.key(1), videos[:1])
    ref_losses, ref_val = [], []
    for k, lr in zip(k_cycles, lrs):
        ref_states, losses, val_mse = cycle(
            ref_states, k, jnp.float32(lr), 8, val_videos, val_targets
        )
        ref_losses.append(losses)
        ref_val.append(val_mse)

    init_states2, scanned = make_scanned_multi_cycle(
        models, SMALL_TRAIN, BASELINE_OPTICS, stack_pairs=stack_pairs
    )
    states = init_states2(jax.random.key(1), videos[:1])
    states, losses, val_mse = scanned(
        states,
        jnp.stack(k_cycles),
        jnp.asarray(lrs, jnp.float32),
        8,
        val_videos,
        val_targets,
    )

    # states are keyed by arm name, or "stack:<a>+<b>" for stacked groups —
    # compare whatever layout the builder produced (identical on both sides)
    assert set(states) == set(ref_states)
    for skey in ref_states:
        for a, b in zip(
            jax.tree.leaves(ref_states[skey].params),
            jax.tree.leaves(states[skey].params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
    for name in models:
        got_losses = np.asarray(losses[name])
        got_val = np.asarray(val_mse[name])
        assert got_losses.shape == (3,) and got_val.shape == (3,)
        for c in range(3):
            np.testing.assert_allclose(got_losses[c], np.asarray(ref_losses[c][name]), rtol=2e-5, atol=1e-6)
            np.testing.assert_allclose(got_val[c], np.asarray(ref_val[c][name]), rtol=2e-5, atol=1e-6)


def test_batch_size_schedule_doubles_and_caps():
    """Reference schedule: batch starts at 1 and doubles every
    `adaptive_batch_size` cycles (trainModels.py:102-108). TPU addition:
    `max_batch_size` caps the doubling — unbounded growth (batch 128 by cycle
    140) OOMs the 30-model vmapped PSFNoise grid on a v5e chip."""
    cfg = TrainConfig(adaptive_batch_size=20, initial_batch_size=1, max_batch_size=64)
    assert cfg.batch_size_for_cycle(0) == 1
    assert cfg.batch_size_for_cycle(19) == 1
    assert cfg.batch_size_for_cycle(20) == 2
    assert cfg.batch_size_for_cycle(80) == 16
    assert cfg.batch_size_for_cycle(120) == 64
    assert cfg.batch_size_for_cycle(140) == 64  # capped (would be 128)
    assert cfg.batch_size_for_cycle(200) == 64
    uncapped = TrainConfig(adaptive_batch_size=20, max_batch_size=0)
    assert uncapped.batch_size_for_cycle(140) == 128
    fixed = TrainConfig(adaptive_batch_size=-1, fixed_batch_size=8)
    assert fixed.batch_size_for_cycle(140) == 8


@pytest.mark.slow
def test_multi_cycle_with_features_validation():
    """make_multi_cycle with feature-fusion models must evaluate validation
    with features (regression: the val path used to drop them, which raises
    for use_global_features models)."""
    from moleculardiffusion_mivit_tpu.train.multi import make_multi_cycle

    models = {
        "mivit": GeneralTransformer(
            SMALL_MODEL, embedding="linear", use_global_features=True, fusion_type="early"
        ),
    }
    videos, labels, feats = generate_cycle_data(
        jax.random.key(0), SMALL_TRAIN, BASELINE_OPTICS, with_features=True
    )
    init_states, cycle = make_multi_cycle(
        models, SMALL_TRAIN, BASELINE_OPTICS, with_features=True
    )
    states = init_states(jax.random.key(1), videos[:1], feats[:1])
    new_states, losses, val_mse = cycle(
        states,
        jax.random.key(2),
        jnp.float32(1e-4),
        8,
        videos[:4],
        labels[:4] * SMALL_TRAIN.d_max_normalization,
        feats[:4],
    )
    assert np.isfinite(float(val_mse["mivit"]))
    assert np.isfinite(float(losses["mivit"]))


def test_scan_unroll_matches_plain_scan():
    """``TrainConfig.scan_unroll`` only changes how XLA lays out the epoch
    loop (body replication): the update SEQUENCE is identical, but unrolling
    lets XLA re-fuse/reorder float ops, so equality holds to float32
    reassociation tolerance (with matmul precision pinned), not bitwise."""
    from moleculardiffusion_mivit_tpu.train.loop import make_train_fns

    model = GeneralTransformer(SMALL_MODEL, embedding="linear")
    key = jax.random.key(11)
    videos, labels, _ = generate_cycle_data(key, SMALL_TRAIN, BASELINE_OPTICS)

    results = {}
    with jax.default_matmul_precision("float32"):
        for unroll in (1, 4):
            cfg = SMALL_TRAIN.replace(scan_unroll=unroll)
            init_state, train_cycle, _ = make_train_fns(model, cfg)
            st = init_state(jax.random.key(2), videos[:1])
            # 32 seqs / batch 8 = 4 steps: unroll=4 exercises full replication
            st, loss = train_cycle(
                st, videos, labels, None, jax.random.key(5), jnp.float32(1e-4), 8
            )
            results[unroll] = (float(loss), jax.tree.leaves(st.params))

    assert np.isclose(results[1][0], results[4][0], rtol=1e-6)
    # AdamW normalizes each update by sqrt(v̂)+eps with v̂ ≈ 0 on the first
    # steps, so float-reassociation noise in the gradients is amplified to
    # the scale of the update itself (lr = 1e-4); parameter agreement is
    # therefore bounded by ~2·lr, while a structural bug (wrong step order,
    # dropped minibatches) shows up as whole-update-magnitude divergence on
    # most leaves plus a loss mismatch, which the assertions still catch.
    for a, b in zip(results[1][1], results[4][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-4)


@pytest.mark.slow
def test_scan_unroll_grid_matches_plain_scan():
    """The vmapped-grid epoch scan honors ``scan_unroll`` too (same
    reassociation-tolerance argument as the single-model test above)."""
    videos, labels, _ = generate_cycle_data(jax.random.key(3), SMALL_TRAIN, BASELINE_OPTICS)
    videos_m = jnp.stack([videos, videos * 0.5])
    labels_m = jnp.stack([labels, labels])

    results = {}
    with jax.default_matmul_precision("float32"):
        for unroll in (1, 4):
            cfg = SMALL_TRAIN.replace(scan_unroll=unroll)
            init_grid, train_cycle, _ = make_grid_train_fns(MultiImageResNet(), cfg)
            grid = init_grid(jax.random.key(1), 2, videos[:1])
            grid, losses = train_cycle(
                grid, videos_m, labels_m, None, jax.random.key(2), jnp.float32(1e-4), 8
            )
            results[unroll] = (np.asarray(losses), jax.tree.leaves(grid.params))

    np.testing.assert_allclose(results[1][0], results[4][0], rtol=1e-6)
    for a, b in zip(results[1][1], results[4][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-4)


def test_detect_activation_stacks():
    """The baseline's 3 relu/leaky GeneralTransformer pairs group into stacks
    (slope 0.0 for relu, the reference's fixed 0.01 for leaky_relu,
    models.py:112); differing architectures and non-GeneralTransformers
    stay out."""
    from moleculardiffusion_mivit_tpu.train import detect_activation_stacks

    models = {
        "lin": GeneralTransformer(SMALL_MODEL.replace(activation="relu"), embedding="linear"),
        "lin_leaky": GeneralTransformer(
            SMALL_MODEL.replace(activation="leaky_relu"), embedding="linear"
        ),
        "cnn": GeneralTransformer(SMALL_MODEL.replace(activation="relu"), embedding="cnn"),
        "gelu": GeneralTransformer(SMALL_MODEL.replace(activation="gelu"), embedding="cnn"),
        "resnet": MultiImageResNet(),
    }
    stacks = detect_activation_stacks(models)
    assert len(stacks) == 1
    names, base, slopes = stacks[0]
    assert names == ["lin", "lin_leaky"] and slopes == (0.0, 0.01)
    assert base is models["lin"]


def test_act_slope_matches_string_activation():
    """A traced ``act_slope`` reproduces the string-configured activations
    exactly on the same parameters: slope 0.01 == "leaky_relu", slope 0 ==
    "relu" (forward; layers.py documents the gradient-at-exactly-0 caveat)."""
    from moleculardiffusion_mivit_tpu.models import init_model

    videos, _, _ = generate_cycle_data(jax.random.key(0), SMALL_TRAIN, BASELINE_OPTICS)
    x = videos[:4]
    relu_model = GeneralTransformer(SMALL_MODEL.replace(activation="relu"), embedding="cnn")
    leaky_model = GeneralTransformer(
        SMALL_MODEL.replace(activation="leaky_relu"), embedding="cnn"
    )
    params, bstats = init_model(relu_model, jax.random.key(1), x[:1])
    variables = {"params": params, "batch_stats": bstats} if bstats else {"params": params}

    for string_model, slope in ((relu_model, 0.0), (leaky_model, 0.01)):
        ref = string_model.apply(variables, x, train=False)
        out = relu_model.apply(variables, x, train=False, act_slope=jnp.float32(slope))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@pytest.mark.slow
def test_multi_cycle_stack_pairs_matches_unstacked():
    """``stack_pairs=True`` is an execution-layout change only: per-model
    losses and validation MSEs match the unstacked fused cycle, member
    params match within the Adam early-step tolerance (O(lr)/element — the
    same reassociation argument as the scan-unroll tests above), and the
    states dict carries the stacked groups."""
    from moleculardiffusion_mivit_tpu.train.multi import make_multi_cycle

    models = {
        "lin": GeneralTransformer(SMALL_MODEL.replace(activation="relu"), embedding="linear"),
        "lin_leaky": GeneralTransformer(
            SMALL_MODEL.replace(activation="leaky_relu"), embedding="linear"
        ),
        "resnet": MultiImageResNet(),
    }
    key = jax.random.key(0)
    ex, _, _ = generate_cycle_data(key, SMALL_TRAIN, BASELINE_OPTICS)
    val, val_t = ex[:6], jnp.ones((6, 1), jnp.float32)

    results = {}
    with jax.default_matmul_precision("float32"):
        for sp in (False, True):
            init_states, cycle = make_multi_cycle(
                models, SMALL_TRAIN, BASELINE_OPTICS, stack_pairs=sp
            )
            states = init_states(key, ex[:1])
            for c in range(2):
                states, losses, vm = cycle(
                    states, jax.random.fold_in(key, c), jnp.float32(1e-4), 8, val, val_t
                )
            results[sp] = (losses, vm, states)

    (l0, v0, s0), (l1, v1, s1) = results[False], results[True]
    assert set(s1) == {"resnet", "stack:lin+lin_leaky"}
    for name in models:
        np.testing.assert_allclose(float(l1[name]), float(l0[name]), rtol=1e-4)
        np.testing.assert_allclose(float(v1[name]), float(v0[name]), rtol=1e-3)
    stacked = s1["stack:lin+lin_leaky"].params
    for j, name in enumerate(["lin", "lin_leaky"]):
        for a, b in zip(jax.tree.leaves(stacked), jax.tree.leaves(s0[name].params)):
            np.testing.assert_allclose(np.asarray(a[j]), np.asarray(b), atol=20 * 1e-4)


@pytest.mark.slow
def test_bfloat16_compute_dtype_trains_and_keeps_f32_master():
    """Mixed precision (TrainConfig.compute_dtype='bfloat16'): the forward/
    backward runs with bf16 params/activations but the master params and
    optimizer state stay f32, training stays finite across model families
    (incl. the BatchNorm resnet, whose running stats must not drift to
    bf16), and one epoch moves the loss in the same direction as f32."""
    from moleculardiffusion_mivit_tpu.train.loop import make_train_fns

    videos, labels, _ = generate_cycle_data(jax.random.key(0), SMALL_TRAIN, BASELINE_OPTICS)
    for model in (
        GeneralTransformer(SMALL_MODEL.replace(dropout=0.1), embedding="linear"),
        MultiImageResNet(),
    ):
        losses = {}
        for dtype in ("float32", "bfloat16"):
            cfg = SMALL_TRAIN.replace(compute_dtype=dtype)
            init_state, cycle, evaluate = make_train_fns(model, cfg)
            st = init_state(jax.random.key(1), videos[:1])
            for c in range(3):
                st, loss = cycle(
                    st, videos, labels, None,
                    jax.random.fold_in(jax.random.key(2), c),
                    jnp.float32(1e-3), 8,
                )
            losses[dtype] = float(loss)
            for leaf in jax.tree.leaves(st.params) + jax.tree.leaves(st.batch_stats):
                assert leaf.dtype == jnp.float32, leaf.dtype
            preds = evaluate(st, videos)
            assert np.isfinite(np.asarray(preds)).all()
        # same training signal: bf16 loss lands in the same ballpark as f32
        assert np.isfinite(losses["bfloat16"])
        assert abs(losses["bfloat16"] - losses["float32"]) < max(
            0.5, 0.5 * losses["float32"]
        ), losses


def test_mix_tails_uniform_swaps_at_split():
    """Continuous-curriculum tail mixing: pairs (i, n-1-i), labels and videos
    switch to the partner's values exactly at the split, the untouched middle
    block is bit-identical, and the total label mass is conserved (the swap
    is a permutation of frame slices)."""
    from moleculardiffusion_mivit_tpu.train.loop import mix_tails_uniform

    key = jax.random.key(0)
    n, f, s = 16, 12, 5
    videos = jnp.arange(n * f * s * s, dtype=jnp.float32).reshape(n, f, s, s)
    labels = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32)[:, None], (n, f)
    )
    mv, ml = mix_tails_uniform(jax.random.key(3), videos, labels, f)
    mv, ml = np.asarray(mv), np.asarray(ml)
    half = (n // 2) // 2  # fraction=0.5 -> n/4 pairs
    for i in range(half):
        j = n - 1 - i
        # before the split: own label; after: partner's label
        row = ml[i]
        changed = row != i
        assert changed.any() and not changed[0]
        split = changed.argmax()
        assert f // 2 - 5 <= split < f // 2 + 5
        assert (row[:split] == i).all() and (row[split:] == j).all()
        assert (ml[j][:split] == j).all() and (ml[j][split:] == i).all()
        np.testing.assert_array_equal(mv[i][split:], np.asarray(videos)[j][split:])
        np.testing.assert_array_equal(mv[i][:split], np.asarray(videos)[i][:split])
    # the middle half is untouched
    np.testing.assert_array_equal(mv[half : n - half], np.asarray(videos)[half : n - half])
    np.testing.assert_allclose(ml.sum(), np.asarray(labels).sum(), rtol=1e-6)


@pytest.mark.slow
def test_baseline_continuous_d_sequence_mode():
    """continuous_d baseline build: per-frame labels carry the drawn D in
    [lo, hi)/d_max, roughly half the sequences carry a planted transition,
    and one fused cycle runs."""
    from moleculardiffusion_mivit_tpu.experiments import get_experiment

    exp = get_experiment(
        "baseline", sequences_per_d=4, val_length=12, sequences=True,
        try_leaky_relu=False, continuous_d=(0.5, 6.0),
    )
    data = exp.generate_fn(jax.random.key(5))
    labels = np.asarray(data["labels"]) * exp.train_cfg.d_max_normalization
    assert labels.shape == (16, 12)
    assert (labels >= 0.5 - 1e-5).all() and (labels <= 6.0 + 1e-5).all()
    mixed = (labels != labels[:, :1]).any(axis=1)
    assert 0 < mixed.sum() <= labels.shape[0] // 2
    assert data["videos"].shape == (16, 12, 9, 9)
    exp.build(jax.random.key(0))
    exp.run(num_cycles=1)
    for name in exp.model_names:
        assert np.isfinite(exp.history[name]["val_avg"][-1])


def test_mix_tails_multi_matches_reference_mixer():
    """The changepoint-modular example reimplements mix_trajectory_tails'
    pairing so it can swap videos, labels AND per-frame feature tokens at
    the same splits — pin it to the train.loop implementation so the two
    cannot drift: given (videos, labels) it must produce bit-identical
    output, and a third array must swap at exactly the label mask."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "cpm", os.path.join(os.path.dirname(__file__), "..", "examples",
                            "sequence_changepoint_modular.py")
    )
    cpm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cpm)

    key = jax.random.key(4)
    n, f, s, n_pf = 32, 12, 5, 3
    videos = jax.random.normal(key, (n, f, s, s))
    labels = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32)[:, None], (n, f))
    feats = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32)[:, None, None], (n, f, n_pf)
    )
    k_mix = jax.random.key(9)
    ref_v, ref_l = mix_trajectory_tails(k_mix, videos, labels, 4, f)
    got_v, got_l, got_f = cpm.mix_tails_multi(k_mix, (videos, labels, feats), 4, f)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))
    # the feature tensor swaps exactly where the labels swapped
    np.testing.assert_array_equal(
        np.asarray(got_f[..., 0]), np.asarray(ref_l)
    )
