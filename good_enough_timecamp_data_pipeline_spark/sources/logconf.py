"""Run logging + .env config loading — operational parity with the
reference's ``common/logger.py:1-46`` (rotating-file + console logger)
and ``common/utils.py:19-26`` (dotenv-based credentials).

Reference users grep ``logs/sync.log`` after a run and keep their API
key in a ``.env`` file; both behaviors exist here with the same
observable semantics:

- ``setup_logger`` — one logger with a 10 MB × 5-backup rotating file
  handler (INFO+) and a console handler (DEBUG when ``debug`` else
  INFO), idempotent per logger name; repeat calls only retune the
  console level. The log file lands under ``log_dir`` (default:
  ``./logs/sync.log`` like the reference; the CLI points it at the
  output directory so artifacts and their run log travel together).
- ``load_dotenv`` — minimal ``.env`` parser (KEY=VALUE lines, ``#``
  comments, surrounding single/double quotes stripped, ``export``
  prefix tolerated). The python-dotenv package is not a dependency of
  this engine, so the subset the reference's config actually uses is
  implemented directly. ``override=True`` matches the reference's
  ``load_dotenv(override=True)`` call.
"""

from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler

LOG_FORMAT = "%(asctime)s - %(levelname)s - %(message)s"
LOG_MAX_BYTES = 10 * 1024 * 1024
LOG_BACKUPS = 5


def setup_logger(
    name: str = "timecamp_sync",
    debug: bool = False,
    log_dir: str = "logs",
) -> logging.Logger:
    """Rotating-file + console logger; same surface as the reference's
    ``setup_logger`` (``/root/reference/common/logger.py:5``)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        logger.setLevel(logging.DEBUG)
        os.makedirs(log_dir, exist_ok=True)
        formatter = logging.Formatter(LOG_FORMAT)

        file_handler = RotatingFileHandler(
            os.path.join(log_dir, "sync.log"),
            maxBytes=LOG_MAX_BYTES,
            backupCount=LOG_BACKUPS,
        )
        file_handler.setFormatter(formatter)
        file_handler.setLevel(logging.INFO)

        console = logging.StreamHandler()
        console.setFormatter(formatter)
        console.setLevel(logging.DEBUG if debug else logging.INFO)

        logger.addHandler(file_handler)
        logger.addHandler(console)
    else:
        # retune the console level on repeat calls (reference behavior)
        for h in logger.handlers:
            if isinstance(h, logging.StreamHandler) and not isinstance(
                h, RotatingFileHandler
            ):
                h.setLevel(logging.DEBUG if debug else logging.INFO)
        # a repeat call with a DIFFERENT log_dir swaps in a new file
        # handler — otherwise a second cli.main() in one process keeps
        # appending to the first run's logs and the "artifacts and their
        # log travel together" contract silently breaks (round-6 ADVICE)
        want = os.path.abspath(os.path.join(log_dir, "sync.log"))
        for h in list(logger.handlers):
            if isinstance(h, RotatingFileHandler) and h.baseFilename != want:
                logger.removeHandler(h)
                h.close()
                os.makedirs(log_dir, exist_ok=True)
                fh = RotatingFileHandler(
                    want, maxBytes=LOG_MAX_BYTES, backupCount=LOG_BACKUPS
                )
                fh.setFormatter(logging.Formatter(LOG_FORMAT))
                fh.setLevel(logging.INFO)
                logger.addHandler(fh)
    return logger


def load_dotenv(path: str = ".env", override: bool = True) -> dict[str, str]:
    """Load KEY=VALUE pairs from ``path`` into ``os.environ``; returns
    the parsed mapping. Silent no-op when the file does not exist (same
    as python-dotenv). ``override=False`` keeps existing env values."""
    loaded: dict[str, str] = {}
    if not os.path.isfile(path):
        return loaded
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export ") :]
            key, _, value = line.partition("=")
            key = key.strip()
            value = value.strip()
            if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
                value = value[1:-1]
            if not key:
                continue
            loaded[key] = value
            if override or key not in os.environ:
                os.environ[key] = value
    return loaded
