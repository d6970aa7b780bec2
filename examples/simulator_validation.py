"""Simulator validation — the runnable equivalent of the reference's
``tests/Simulator_tests/AnDi-Tests.ipynb`` and
``Images_creation_tests.ipynb`` exploratory notebooks.

Checks, with printed numbers instead of plots:
  1. label format of ``single_state`` (alpha, D, state per step);
  2. MSD loop closure: D re-estimated from generated trajectories matches
     the labels (AnDi-Tests cell 4);
  3. coarse-sampling effect: frame-averaged trajectories underestimate D
     (AnDi-Tests cells 10-16);
  4. localization-noise effect on recovered D;
  5. renderer geometry: a resolution of 200 nm moves the particle half as
     far on screen as 100 nm (Images_creation_tests md cell 11);
  6. SNR limits: peak-to-background contrast across noise levels.

Run: python examples/simulator_validation.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS
from moleculardiffusion_mivit_tpu.features import (
    estimate_d_from_msds,
    mean_square_displacements,
)
from moleculardiffusion_mivit_tpu.sim import (
    average_trajectories_frames,
    single_state,
    trajectories_to_video,
)


def main():
    key = jax.random.key(0)

    # 1. label format
    trajs, labels = single_state(key, 5, 50, Ds=(3.0, 1.0), alphas=1)
    print("labels (alpha, D, state) of first 3 particles:")
    print(np.asarray(labels[:3, 0]))

    # 2. loop closure
    trajs, labels = single_state(key, 500, 300, Ds=(5.0, 0.0))
    msds = mean_square_displacements(trajs)
    d_est = estimate_d_from_msds(msds, jnp.arange(300, dtype=jnp.float32))
    print(f"\nloop closure: true D=5.0, MSD-estimated D={float(d_est.mean()):.3f}")

    # 3. coarse sampling
    avg = average_trajectories_frames(trajs, 10)
    msds_avg = mean_square_displacements(avg)
    d_avg = estimate_d_from_msds(msds_avg, 10 * jnp.arange(30, dtype=jnp.float32))
    print(
        f"coarse sampling (10 sub-positions averaged): D={float(d_avg.mean()):.3f} "
        "(exposure averaging biases D down)"
    )

    # 4. localization noise
    noisy = avg + 3.0 * jax.random.normal(jax.random.key(1), avg.shape)
    d_noisy = estimate_d_from_msds(
        mean_square_displacements(noisy), 10 * jnp.arange(30, dtype=jnp.float32)
    )
    print(f"+ localization noise sigma=0.5: D={float(d_noisy.mean()):.3f} (biased up)")

    # 5. resolution scaling
    k = jax.random.key(2)
    step = jnp.zeros((1, 20, 2)).at[:, 10:, 0].set(200.0)  # 200 nm jump
    optics_100 = BASELINE_OPTICS.replace(
        trajectory_unit=1.0, background_intensity=(0.0, 0.0), poisson_noise=-1.0
    )
    optics_200 = optics_100.replace(resolution=200e-9)
    v100 = np.asarray(trajectories_to_video(k, step, 10, False, optics_100))
    v200 = np.asarray(trajectories_to_video(k, step, 10, False, optics_200))
    c100 = [np.unravel_index(f.argmax(), f.shape)[1] for f in v100[0]]
    c200 = [np.unravel_index(f.argmax(), f.shape)[1] for f in v200[0]]
    print(
        f"\nresolution scaling: 200nm jump moves peak by {c100[1]-c100[0]} px at "
        f"100nm/px, {c200[1]-c200[0]} px at 200nm/px"
    )

    # 6. SNR sweep
    print("\nSNR sweep (peak-to-background contrast):")
    for bg_std in (50.0, 150.0, 290.0, 500.0):
        optics = BASELINE_OPTICS.replace(background_intensity=(1420.0, bg_std))
        trajs, _ = single_state(jax.random.key(3), 32, 300, Ds=(3.0, 0.0))
        vids = np.asarray(trajectories_to_video(jax.random.key(4), trajs / 100, 10, True, optics))
        peak = vids.max(axis=(2, 3)).mean()
        bg = np.median(vids)
        print(f"  bg sigma {bg_std:5.0f}: peak {peak:7.0f}, bg {bg:7.0f}, contrast {(peak-bg)/bg_std:5.1f}σ")


if __name__ == "__main__":
    main()
