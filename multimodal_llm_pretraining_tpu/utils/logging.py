"""Named-logger plumbing.

Mirrors the reference's single named stdlib logger ``"academic-pretraining"``
(``src/benchmarking/step_time.py:11``) with per-process routing; multi-host
runs prefix records with the JAX process index so interleaved host logs stay
attributable (the reference got this from torchrunx handler factories,
``experiments/utils/distribute.py:13-34``).
"""

import logging
import os
import sys

LOGGER_NAME = "mlpt"

_configured = False


class _ProcessPrefixFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        record.process_index = os.environ.get("MLPT_PROCESS_INDEX", "0")
        return True


def get_logger() -> logging.Logger:
    global _configured
    logger = logging.getLogger(LOGGER_NAME)
    if not _configured:
        _configured = True
        logger.setLevel(os.environ.get("MLPT_LOG_LEVEL", "INFO"))
        handler = logging.StreamHandler(sys.stderr)
        handler.addFilter(_ProcessPrefixFilter())
        handler.setFormatter(logging.Formatter("[%(name)s p%(process_index)s %(asctime)s] %(message)s", datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.propagate = False
        log_dir = os.environ.get("MLPT_LOG_DIR")
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, f"host_{os.environ.get('MLPT_PROCESS_INDEX', '0')}.log"))
            fh.addFilter(_ProcessPrefixFilter())
            fh.setFormatter(logging.Formatter("[%(asctime)s p%(process_index)s] %(message)s"))
            logger.addHandler(fh)
    return logger
