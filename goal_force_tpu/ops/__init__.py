from goal_force_tpu.ops.attention import attention  # noqa: F401
from goal_force_tpu.ops.rope import apply_rope, rope_tables_3d  # noqa: F401
