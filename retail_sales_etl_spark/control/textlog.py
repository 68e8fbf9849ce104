"""Per-run text log artifact (reference utils/text_logger.py:24).

The reference writes human-readable pipeline logs to a rotating
``logs/etl_logs.log`` beside its control DB; ops greps that file when
a run misbehaves. Parity here: one shared rotating file per control
directory, UTC timestamps, and the same field layout
(``ts | level | module | pipeline | run_id | message``). The log is
driver-side only — a handful of lines per run, never per row — so it
adds zero data-plane cost at any scale.
"""

from __future__ import annotations

import logging
import os
from datetime import datetime, timezone
from logging.handlers import RotatingFileHandler

LOG_FILE_NAME = "etl_logs.log"
_FORMAT = (
    "%(asctime)s | %(levelname)s | %(module)s | %(pipeline_name)s"
    " | %(run_id)s | %(message)s"
)


def _utc_time(*args):
    return datetime.now(timezone.utc).timetuple()


def get_logger(
    run_id: str,
    pipeline_name: str,
    log_dir: str,
    level: int = logging.INFO,
) -> logging.LoggerAdapter:
    """Logger writing to ``<log_dir>/etl_logs.log`` (rotating, 5 MB x3).

    The underlying logger is keyed by the log file so every pipeline in
    a process appends to one file (reference safeguards the same way);
    the adapter binds this run's identity fields.
    """
    os.makedirs(log_dir, exist_ok=True)
    log_file = os.path.join(log_dir, LOG_FILE_NAME)

    logger = logging.getLogger(f"retail_sales_etl_spark.{log_file}")
    logger.setLevel(level)
    logger.propagate = False
    if not any(
        isinstance(h, RotatingFileHandler)
        and getattr(h, "baseFilename", None) == os.path.abspath(log_file)
        for h in logger.handlers
    ):
        handler = RotatingFileHandler(
            filename=log_file, maxBytes=5 * 1024 * 1024, backupCount=3
        )
        formatter = logging.Formatter(_FORMAT)
        formatter.converter = _utc_time
        handler.setFormatter(formatter)
        logger.addHandler(handler)

    return logging.LoggerAdapter(
        logger, {"pipeline_name": pipeline_name, "run_id": run_id}
    )
