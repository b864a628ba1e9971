"""Device-side compute primitives (JAX/XLA/Pallas) used across the framework."""
