"""Logging setup — the reference's log.py analog for the CLI.

Same observable layout (reference log.py:33-67): console at INFO,
midnight-rotating ``debug.log`` / ``info.log`` / ``warn.log`` under a
``var/log/`` directory (30 backups), and the ``requests`` logger
quieted to WARN. One difference by design: this engine's workers are
Ray processes whose stdout/stderr Ray already aggregates, so
``setup_logging`` is DRIVER-side only (call it from the CLI / your
entry script, never from library code or inside map_batches).
"""

from __future__ import annotations

import logging
import os
from logging.handlers import TimedRotatingFileHandler

CONSOLE_FORMAT = "%(levelname)-8s %(module)-10s %(message)s"
FILE_FORMAT = "%(asctime)s %(levelname)-8s %(module)-10s %(message)s"

_FILE_LEVELS = (
    ("debug.log", logging.DEBUG),
    ("info.log", logging.INFO),
    ("warn.log", logging.WARN),
)


def default_log_dir(base_dir: str | None = None) -> str:
    """``{base}/var/log`` with the reference's bin-dir convention:
    a script running from ``.../bin`` logs next to its checkout."""
    import sys

    if base_dir is None:
        script_dir = os.path.dirname(os.path.abspath(sys.argv[0]))
        base_dir = (
            os.path.dirname(script_dir)
            if script_dir.endswith("bin") else os.getcwd()
        )
    return os.path.join(base_dir, "var", "log")


def setup_logging(log_dir: str | None = None) -> str:
    """Configure root logging (idempotent: clears handlers this
    function added before). Returns the log directory used."""
    log_dir = log_dir or default_log_dir()
    os.makedirs(log_dir, exist_ok=True)

    root = logging.root
    for h in list(root.handlers):
        if getattr(h, "_ftw_crawler_ray", False):
            root.removeHandler(h)
    root.setLevel(logging.DEBUG)

    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(logging.Formatter(CONSOLE_FORMAT))
    console._ftw_crawler_ray = True
    root.addHandler(console)

    file_formatter = logging.Formatter(FILE_FORMAT, datefmt="%Y-%m-%d %H:%M:%S")
    for filename, level in _FILE_LEVELS:
        handler = TimedRotatingFileHandler(
            os.path.join(log_dir, filename), when="midnight", backupCount=30
        )
        handler.setLevel(level)
        handler.setFormatter(file_formatter)
        handler._ftw_crawler_ray = True
        root.addHandler(handler)

    logging.getLogger("requests").setLevel(logging.WARN)
    return log_dir
