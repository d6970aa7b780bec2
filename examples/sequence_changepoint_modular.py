"""Change-point detection with per-frame feature tokens (round 4, the
second accuracy lever the verdict asked about; round 5 adds the hybrid arm
and proper binomial statistics).

The curriculum and data-scale levers both left adjacent-class (ΔD=1)
detection at zero (results/changepoint_{continuous,scaled}). This study
tries the remaining round-3 accuracy lever: the ModularTransformer's
per-frame kinematic feature tokens (models.py:366-593 pathway, the D ≤ 7
regression champion), in SEQUENCE mode — per-frame D predictions from
image tokens fused with per-frame displacement features. The feature
tokens give the model direct per-frame displacement evidence, the
quantity a transition detector needs.

Protocol mirrors examples/sequence_changepoint_demo.py exactly (4 discrete
classes, tail-swap training augmentation, planted-transition evaluation,
threshold calibrated to 5% FP on an independent constant-D split) — with
the tail swap applied consistently to videos, per-frame labels AND
per-frame feature tokens at the same splits. The arms train on the SAME
generated data so the comparison is internal: ``mod_images`` (image tokens
only — the architecture control), ``mod_both_concat`` (per-frame feature
fusion), and with ``--with-hybrid`` the sequence-mode
``HybridFusionTransformer`` (per-frame feature tokens + a global-feature
reg token riding along as context) — does the global pathway help or cost
per-frame change sensitivity? The hybrid's 25-dim global features are
computed from the SPLICED frame-averaged trajectory (the evidence a global
extractor would actually see on a transition sequence); its per-frame
tokens are the same swapped tokens the modular arms see.

Round-5 statistics: ``--eval-per-class`` scales the planted-transition
evaluation (64 → hundreds of transitions per ΔD cell) and every detection
rate carries a 95% Wilson binomial CI — the round-4 headline cells sat on
n=20 per ΔD (verdict Weak #3).

Run: python examples/sequence_changepoint_modular.py [--cycles 150]
         [--seqs-per-d 256] [--eval-per-class 64] [--with-hybrid]
         [--out results/changepoint_modular]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def mix_tails_multi(key, arrays, n_classes: int, n_frames: int):
    """``train.loop.mix_trajectory_tails``'s pairing scheme (quarter-block
    pairs 0↔3, 0↔2, 1↔3, 1↔2 at splits in [F/2-5, F/2+5)) applied to any
    number of frame-major arrays at the SAME splits — videos (N, F, S, S),
    labels (N, F) and per-frame feature tokens (N, F, n_pf) must swap
    consistently or the fused model sees contradictory modalities."""
    n_total = arrays[0].shape[0]
    n_per = n_total // n_classes
    quarter = n_per // 4
    if quarter == 0 or n_classes < 4:
        return arrays
    arrays = list(arrays)
    frame_idx = jnp.arange(n_frames)
    pairs = [(0, 3, 0), (0, 2, quarter), (1, 3, quarter), (1, 2, 0)]
    for pair_i, (ca, cb, start) in enumerate(pairs):
        k = jax.random.fold_in(key, pair_i)
        splits = jax.random.randint(k, (quarter,), n_frames // 2 - 5, n_frames // 2 + 5)
        ia = ca * n_per + start + jnp.arange(quarter)
        ib = cb * n_per + start + jnp.arange(quarter)
        base = frame_idx[None, :] >= splits[:, None]  # (quarter, F)
        for j, arr in enumerate(arrays):
            mask = base.reshape(base.shape + (1,) * (arr.ndim - 2))
            a, bb = arr[ia], arr[ib]
            arr = arr.at[ia].set(jnp.where(mask, bb, a))
            arrays[j] = arr.at[ib].set(jnp.where(mask, a, bb))
    return tuple(arrays)


def wilson_ci(k: int, n: int, z: float = 1.96):
    """95% Wilson score interval for a binomial proportion (round 5: every
    detection rate carries its CI — the round-4 cells sat on n=20)."""
    if n == 0:
        return None
    p = k / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5) / denom
    return [round(center - half, 3), round(center + half, 3)]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cycles", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0, help="training/init key (the planted-transition eval set stays on its own held-out key)")
    ap.add_argument("--seqs-per-d", type=int, default=256)
    ap.add_argument(
        "--eval-per-class",
        type=int,
        default=64,
        help="planted-transition evaluation size per D class (the round-4 "
        "studies pinned 64 — n=20 per ΔD cell; use ≥320 for ≥100/cell)",
    )
    ap.add_argument(
        "--with-hybrid",
        action="store_true",
        help="add the sequence-mode HybridFusionTransformer arm (per-frame "
        "feature tokens + global-feature reg token)",
    )
    ap.add_argument(
        "--continuous",
        type=str,
        default=None,
        metavar="LO,HI",
        help="train with per-sequence D ~ Uniform(LO, HI) and random-partner "
        "tail mixing (train.loop.mix_tails_uniform's scheme extended to the "
        "feature tokens) instead of the 4 discrete classes — asks whether "
        "the curriculum that HURT the image-only detector still hurts once "
        "per-frame feature tokens carry the signal. The planted-transition "
        "evaluation stays on the discrete protocol either way.",
    )
    ap.add_argument("--out", default="results/changepoint_modular")
    args = ap.parse_args()

    from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS, ModelConfig, TrainConfig
    from moleculardiffusion_mivit_tpu.evaluation import detect_change_points
    from moleculardiffusion_mivit_tpu.features import (
        N_PER_FRAME_FEATURES,
        compute_per_frame_features,
    )
    from moleculardiffusion_mivit_tpu.models import ModularTransformer
    from moleculardiffusion_mivit_tpu.sim import normalize_images, single_state, trajectories_to_video
    from moleculardiffusion_mivit_tpu.sim.trajectory import average_trajectories_frames
    from moleculardiffusion_mivit_tpu.train import make_train_fns

    train_cfg = TrainConfig(
        seed=0,
        sequences_per_d=args.seqs_per_d,
        training_ds=((1, 1), (3, 1), (5, 1), (7, 1)),
        sequence_mode=True,
        mix_trajectories=True,
    )
    # sequence-mode config mirrors the baseline experiment's
    # (trainSettings.py:26/34): positional encoding on, per-token outputs
    model_cfg = ModelConfig(
        use_pos_encoding=True, use_regression_token=False, single_prediction=False
    )
    optics = BASELINE_OPTICS
    p, f = train_cfg.n_pos_per_frame, train_cfg.n_frames
    n_classes = len(train_cfg.training_ds)
    bg_mean, bg_sigma = optics.background_intensity
    part_mean = optics.particle_intensity[0]

    def generate(key, seqs_per_d: int, mix: bool):
        """Videos + per-frame labels + per-frame feature tokens + the
        frame-averaged trajectory, tails swapped consistently across all
        four when ``mix`` (the avg trajectory splices at the same splits,
        so global features computed from it see the transition evidence)."""
        k_mix = jax.random.fold_in(key, 999)
        videos, labels, pf, avgs = [], [], [], []
        for i, ds in enumerate(train_cfg.training_ds):
            k_sim, k_render = jax.random.split(jax.random.fold_in(key, i))
            trajs, labs = single_state(k_sim, seqs_per_d, f * p, Ds=tuple(ds))
            trajs = trajs / train_cfg.traj_div_factor
            v = trajectories_to_video(k_render, trajs, p, train_cfg.center, optics)
            v, _ = normalize_images(v, bg_mean, bg_sigma, part_mean + bg_mean)
            videos.append(v)
            avg = average_trajectories_frames(trajs, p)
            avgs.append(avg)
            pf.append(compute_per_frame_features(avg))
            y = labs[:, :, 1].reshape(seqs_per_d, f, p).mean(axis=2)
            labels.append(y / train_cfg.d_max_normalization)
        videos = jnp.concatenate(videos)
        labels = jnp.concatenate(labels)
        pf = jnp.concatenate(pf)
        avgs = jnp.concatenate(avgs)
        if mix:
            videos, labels, pf, avgs = mix_tails_multi(
                k_mix, (videos, labels, pf, avgs), n_classes, f
            )
        return videos, labels, pf, avgs

    continuous = None
    if args.continuous:
        lo, hi = (float(x) for x in args.continuous.split(","))
        continuous = (lo, hi)
        from moleculardiffusion_mivit_tpu.sim.trajectory import brownian_motion

        def generate_train(key, seqs_per_d: int):
            """Continuous curriculum: D ~ U(lo, hi) per sequence, i↔(n-1-i)
            partner tail-mixing (mix_tails_uniform's scheme) applied to
            videos, labels, feature tokens and the avg trajectory at the
            same splits."""
            n_total = seqs_per_d * n_classes
            kd, kt, kr, k_mix = jax.random.split(key, 4)
            d = jax.random.uniform(kd, (n_total,), minval=lo, maxval=hi)
            trajs = (
                brownian_motion(kt, n_total, f, p, d, float(p))
                / train_cfg.traj_div_factor
            )
            v = trajectories_to_video(kr, trajs, p, train_cfg.center, optics)
            v, _ = normalize_images(v, bg_mean, bg_sigma, part_mean + bg_mean)
            avg = average_trajectories_frames(trajs, p)
            pfx = compute_per_frame_features(avg)
            labels = jnp.broadcast_to(
                (d / train_cfg.d_max_normalization)[:, None], (n_total, f)
            ).astype(jnp.float32)
            # mix_tails_uniform's pairing (i <-> n-1-i, half the sequences),
            # extended to 4 arrays at shared splits
            half = (n_total // 2) // 2
            ia = jnp.arange(half)
            ib = (n_total - 1) - ia
            splits = jax.random.randint(k_mix, (half,), f // 2 - 5, f // 2 + 5)
            base = jnp.arange(f)[None, :] >= splits[:, None]
            out = []
            for arr in (v, labels, pfx, avg):
                mask = base.reshape(base.shape + (1,) * (arr.ndim - 2))
                a, bb = arr[ia], arr[ib]
                arr = arr.at[ia].set(jnp.where(mask, bb, a))
                out.append(arr.at[ib].set(jnp.where(mask, a, bb)))
            return tuple(out)

    else:

        def generate_train(key, seqs_per_d: int):
            return generate(key, seqs_per_d, mix=True)

    def modular(mode):
        return ModularTransformer(
            model_cfg,
            mode=mode,
            image_embedding="deep_resnet",
            features_dim=N_PER_FRAME_FEATURES,
            feature_embedding_type="mlp",
            fusion_method="concat_proj",
        )

    from moleculardiffusion_mivit_tpu.features import (
        compute_features_for_multiple_trajectories,
    )

    def pack_hybrid(pf, avg):
        """HybridFusionTransformer packing (experiments.modular.make_dataset):
        per-frame tokens flattened + the 25-dim global features of the
        (possibly spliced) frame-averaged trajectory."""
        gf = compute_features_for_multiple_trajectories(avg, dt=1.0)
        return jnp.concatenate([pf.reshape(pf.shape[0], -1), gf], axis=-1)

    # name -> (model, feature kind): "pf" = per-frame tokens, "packed" =
    # the hybrid's pf+global packing
    arms = {
        "mod_images": (modular("images_only"), "pf"),
        "mod_both_concat": (modular("both"), "pf"),
    }
    if args.with_hybrid:
        from moleculardiffusion_mivit_tpu.models import HybridFusionTransformer

        arms["mod_hybrid"] = (
            HybridFusionTransformer(
                model_cfg,
                image_embedding="deep_resnet",
                per_frame_dim=N_PER_FRAME_FEATURES,
                global_dim=25,
                fusion_method="concat_proj",
            ),
            "packed",
        )
    key = jax.random.key(args.seed)
    ex_videos, _, ex_pf, ex_avg = generate(jax.random.fold_in(key, 0), 4, mix=False)
    ex_feats = {"pf": ex_pf, "packed": pack_hybrid(ex_pf, ex_avg)}

    import time

    states, fns, featkind = {}, {}, {}
    for i, (name, (model, kind)) in enumerate(arms.items()):
        init_state, train_cycle, evaluate = make_train_fns(
            model, train_cfg, with_features=True
        )
        fns[name] = (train_cycle, evaluate)
        featkind[name] = kind
        states[name] = init_state(
            jax.random.fold_in(key, i), ex_videos[:1], ex_feats[kind][:1]
        )

    need_packed = any(k == "packed" for k in featkind.values())
    t0 = time.time()
    for c in range(args.cycles):
        k_c = jax.random.fold_in(key, 10 + c)
        videos, labels, pf, avg = generate_train(k_c, args.seqs_per_d)
        feats = {"pf": pf}
        if need_packed:
            feats["packed"] = pack_hybrid(pf, avg)
        lr = jnp.float32(train_cfg.lr_for_cycle(c))
        bs = train_cfg.batch_size_for_cycle(c)
        for j, name in enumerate(arms):
            states[name], loss = fns[name][0](
                states[name], videos, labels, feats[featkind[name]],
                jax.random.fold_in(k_c, 100 + j), lr, bs,
            )
        if (c + 1) % 25 == 0:
            print(f"cycle {c+1}/{args.cycles} loss {float(loss):.5f}", flush=True)
    print(f"trained in {time.time()-t0:.0f}s", flush=True)

    # -- planted-transition evaluation (demo protocol: held-out key,
    # --eval-per-class size, independent calibration split) ----------------
    E = args.eval_per_class
    k_eval = jax.random.key(777)
    videos, labels, pf, avg = generate(k_eval, E, mix=False)
    mixed_v, mixed_l, mixed_pf, mixed_avg = mix_tails_multi(
        jax.random.fold_in(k_eval, 1), (videos, labels, pf, avg), n_classes, f
    )
    cal_v, _, cal_pf, cal_avg = generate(jax.random.fold_in(k_eval, 2), E, mix=False)
    eval_feats = {
        "pf": (mixed_pf, pf, cal_pf),
    }
    if need_packed:
        eval_feats["packed"] = (
            pack_hybrid(mixed_pf, mixed_avg),
            pack_hybrid(pf, avg),
            pack_hybrid(cal_pf, cal_avg),
        )

    def eval_chunked(evaluate, state, v, fe, chunk=256):
        """Grid-arm rule (CLAUDE.md): large eval batches stay chunked — the
        deep-resnet activations of thousands of 30-frame sequences OOM."""
        return np.concatenate(
            [
                np.asarray(evaluate(state, v[i : i + chunk], fe[i : i + chunk]))
                for i in range(0, v.shape[0], chunk)
            ]
        )

    ml = np.asarray(mixed_l) * train_cfg.d_max_normalization
    changed = ml != ml[:, :1]
    has_transition = changed.any(axis=1)
    true_split = np.where(has_transition, changed.argmax(axis=1), -1)
    contrast = np.abs(ml[:, -1] - ml[:, 0])

    report = {"cycles": args.cycles, "seqs_per_d": args.seqs_per_d, "seed": args.seed,
              "eval_per_class": E,
              "curriculum": f"continuous U{continuous}" if continuous else "discrete 4-class",
              "n_mixed": int(has_transition.sum()), "n_controls": int(videos.shape[0])}
    for name in arms:
        evaluate = fns[name][1]
        fm, fc, fcal = eval_feats[featkind[name]]
        pm = eval_chunked(evaluate, states[name], mixed_v, fm).squeeze(-1)
        pc = eval_chunked(evaluate, states[name], videos, fc).squeeze(-1)
        pcal = eval_chunked(evaluate, states[name], cal_v, fcal).squeeze(-1)
        split_m, score_m = map(np.asarray, detect_change_points(jnp.asarray(pm)))
        _, score_c = detect_change_points(jnp.asarray(pc))
        _, score_cal = detect_change_points(jnp.asarray(pcal))
        score_c, score_cal = np.asarray(score_c), np.asarray(score_cal)
        sm = score_m[has_transition]
        auc = float((sm[:, None] > score_c[None, :]).mean()
                    + 0.5 * (sm[:, None] == score_c[None, :]).mean())
        thr = float(np.percentile(score_cal, 95.0))
        hit = has_transition & (score_m > thr)
        loc = np.abs(split_m[hit] - true_split[hit])
        by_contrast = {}
        for dd in sorted(set(np.round(contrast[has_transition]).astype(int))):
            sel = has_transition & (np.round(contrast).astype(int) == dd)
            k_det, n_det = int((score_m[sel] > thr).sum()), int(sel.sum())
            by_contrast[f"dD={dd}"] = {
                "n": n_det,
                "detected": k_det,
                "detection_rate": round(k_det / n_det, 3) if n_det else None,
                "ci95": wilson_ci(k_det, n_det),
            }
        n_t = int(has_transition.sum())
        k_t = int((sm > thr).sum())
        n_c = len(score_c)
        k_fp = int((score_c > thr).sum())
        report[name] = {
            "roc_auc": round(auc, 3),
            "detection_rate": round(k_t / n_t, 3),
            "detection_ci95": wilson_ci(k_t, n_t),
            "false_positive_rate": round(k_fp / n_c, 3),
            "false_positive_ci95": wilson_ci(k_fp, n_c),
            "median_split_error_frames": float(np.median(loc)) if len(loc) else None,
            "by_contrast": by_contrast,
        }
        print(name, json.dumps(report[name]), flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "changepoint_modular.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"report -> {args.out}/changepoint_modular.json")


if __name__ == "__main__":
    main()
