"""Shared persistent-XLA-compile-cache setup.

One implementation used by both the CLI (cli.py) and bench.py — the two
copies previously drifted independently (round-3 advisor finding).
Override the directory with STYLISH_TPU_CACHE; disable with
STYLISH_TPU_CACHE=0.
"""

from __future__ import annotations

import os
import os.path as osp
import sys

DEFAULT_CACHE_DIR = osp.join(
    osp.expanduser("~"), ".cache", "stylish_tts_tpu", "xla"
)


def setup_persistent_cache(logger=None, warn_stderr: bool = False) -> bool:
    """Point JAX at the shared on-disk compilation cache.

    Returns True when the cache was configured. Failures never raise —
    but they are *visible*: logged at debug when a logger is given,
    printed to stderr when warn_stderr (bench runs, where a silently
    missing cache costs multi-minute remote compiles every invocation).
    """
    cache_dir = os.environ.get("STYLISH_TPU_CACHE", DEFAULT_CACHE_DIR)
    if cache_dir == "0":
        return False
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        return True
    except Exception as exc:
        if logger is not None:
            logger.debug("compilation cache unavailable: %s", exc)
        if warn_stderr:
            print(
                f"warning: XLA compile cache unavailable ({cache_dir}): "
                f"{type(exc).__name__}: {exc}",
                file=sys.stderr,
            )
        return False
