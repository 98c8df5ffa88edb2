from goal_force_tpu.schedulers.flow_match import (  # noqa: F401
    FlowMatchSchedule,
    add_noise,
    euler_step,
    make_schedule,
    training_target,
)
