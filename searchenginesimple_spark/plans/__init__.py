"""Job plans: resumable index build with per-partition checkpoints + metrics."""
