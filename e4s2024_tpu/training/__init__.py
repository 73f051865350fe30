from e4s2024_tpu.training.coach import Coach, TrainConfig, CoachState
