"""sushi-tpu: a TPU-native automatic subtitle retimer.

A ground-up rebuild of the capabilities of tp7/Sushi (an audio-based
subtitle shifter) designed TPU-first:

* host side (CPU, Python): media demuxing, RIFF/WAVE ingest, subtitle /
  chapter / keyframe / timecode parsing, grouping and repair heuristics;
* device side (TPU, JAX/XLA/Pallas): audio normalization and the batched
  normalized-SSD shift search — all per-event template matches execute as
  fixed-shape batched FFT kernels instead of the reference's sequential
  ``cv2.matchTemplate`` calls.

The public API mirrors what a user of the reference needs: a CLI
(``sushi-tpu`` / ``python -m sushi_tpu``), script objects, and the
alignment pipeline.
"""

from sushi_tpu.version import VERSION, __version__
from sushi_tpu.errors import SushiError

__all__ = ["VERSION", "__version__", "SushiError"]
