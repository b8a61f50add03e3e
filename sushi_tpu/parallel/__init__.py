"""Multi-device execution: mesh helpers, lag-sharded wide-window search,
episode-batch data parallelism."""
