"""Training layer: losses, schedules, optimizers, train step, checkpoints."""
