from moleculardiffusion_mivit_tpu.realdata.detect import detect_particles, detect_particles_stack  # noqa: F401
from moleculardiffusion_mivit_tpu.realdata.link import link_particles  # noqa: F401
from moleculardiffusion_mivit_tpu.realdata.track import track_particles  # noqa: F401
from moleculardiffusion_mivit_tpu.realdata.patches import extract_particle_patches  # noqa: F401
from moleculardiffusion_mivit_tpu.realdata.localize import refine_localizations  # noqa: F401
from moleculardiffusion_mivit_tpu.realdata.stats import (  # noqa: F401
    compute_displacement,
    tracks_to_dataframe,
)
from moleculardiffusion_mivit_tpu.realdata.pipeline import (  # noqa: F401
    analyze_microscopy_sequence,
    estimate_d_for_tracks,
)
from moleculardiffusion_mivit_tpu.realdata.tiff import read_tiff_stack, write_tiff_stack  # noqa: F401
