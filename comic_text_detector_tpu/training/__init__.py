"""Training stack: losses, optimization, train loops, metrics, checkpoints."""
