"""Device-side compute: batched normalized-SSD template matching."""
