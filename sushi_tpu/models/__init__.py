"""The "model" layer: jittable alignment steps used by entry points and
multi-chip dry runs."""
