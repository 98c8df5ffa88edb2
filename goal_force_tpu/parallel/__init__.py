from goal_force_tpu.parallel.mesh import (  # noqa: F401
    MESH_AXES,
    constrain,
    current_mesh,
    make_mesh,
    use_mesh,
)
from goal_force_tpu.parallel.sharding import (  # noqa: F401
    fsdp_specs,
    inference_param_specs,
    place,
)
