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

__all__ = [
    "VERSION",
    "__version__",
    "SushiError",
    # lazily-importable public surface (heavy deps load on first use):
    #   sushi_tpu.cli.main / parse_args_and_run   — the CLI
    #   sushi_tpu.pipeline.run                    — one-episode pipeline
    #   sushi_tpu.season.sync_season              — batch season sync
    #   sushi_tpu.media.stream.AudioStream        — WAV -> analysis buffer
    #   sushi_tpu.text.subs.load_script           — ASS/SRT scripts
    #   sushi_tpu.align.batcher.calculate_shifts  — batched shift search
]
