from goal_force_tpu.data.control_signal import (  # noqa: F401
    ControlSpec,
    gaussian_blob,
    mass_blob_radius,
    render_control_video,
)
