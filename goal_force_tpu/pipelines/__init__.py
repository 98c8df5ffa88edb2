from goal_force_tpu.pipelines.goal_force import GoalForcePipeline  # noqa: F401
