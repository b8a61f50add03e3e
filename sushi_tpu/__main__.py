"""``python -m sushi_tpu`` entry point."""

from sushi_tpu.cli import main

main()
