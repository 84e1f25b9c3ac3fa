"""Training engine: losses, metrics, solver, eval pipeline, checkpoints."""
