from moleculardiffusion_mivit_tpu.sim.trajectory import (  # noqa: F401
    brownian_motion,
    average_trajectories_frames,
    fractional_gaussian_noise,
    fbm_trajectories,
    reflect_into_box,
    single_state,
)
from moleculardiffusion_mivit_tpu.sim.render import (  # noqa: F401
    render_frames_core,
    set_render_backend,
    trajectories_to_video,
    trajectories_to_video_multiple_settings,
    trajectories_to_video_psf_noise_grid,
    normalize_images,
    generate_traj_and_videos_brownian,
    render_widefield,
)
from moleculardiffusion_mivit_tpu.sim.constrained import (  # noqa: F401
    Edge,
    PiecewiseLinearGeometry,
    disp_fbm,
    reflected_rectangle_trajectories,
)
