"""Cost models, profiling, and metrics."""
