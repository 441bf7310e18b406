"""`python -m stylish_tts_tpu.cli_tts` == the stylish-tts console script."""

from .cli import tts_cli

if __name__ == "__main__":
    tts_cli()
