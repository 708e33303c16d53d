"""Stage-error channel mirroring the reference's errors.log logging.

Reference parity: the reference installs a FileHandler on errors.log
(parser.py:37-55) and its exception classes log themselves on
construction (AccessLogDataFrameError, dataframe.py:12-16;
AccessLogRiskError, risk.py:16-20) — so EVERY stage error, not just
unparseable input lines, lands in errors.log. This module is the
engine's equivalent: `configure_stage_errors()` points the channel at
a file, and `EngineStageError` writes itself there when raised.

Unconfigured, the channel is a no-op (NullHandler): libraries must not
write files as an import side effect. The CLI configures it when
--errors-log is passed; tests point it at a tmp path.
"""

from __future__ import annotations

import logging

_LOGGER = logging.getLogger("webloghunter_spark.stage_errors")
_LOGGER.addHandler(logging.NullHandler())
_LOGGER.propagate = False


def configure_stage_errors(path: str = "errors.log", level: int = logging.ERROR) -> None:
    """Append stage-error records to `path` in the reference's
    errors.log format. Replaces any previous handler (the reference
    clears handlers on re-init, parser.py:38-40)."""
    for h in list(_LOGGER.handlers):
        _LOGGER.removeHandler(h)
        h.close()
    handler = logging.FileHandler(path, mode="a")
    handler.setFormatter(
        logging.Formatter(
            "AccessLogDataFrameError - %(asctime)s - %(levelname)s - %(message)s"
        )
    )
    _LOGGER.addHandler(handler)
    _LOGGER.setLevel(level)


def reset_stage_errors() -> None:
    """Back to the no-op channel (tests / end of a CLI run)."""
    for h in list(_LOGGER.handlers):
        _LOGGER.removeHandler(h)
        h.close()
    _LOGGER.addHandler(logging.NullHandler())


class EngineStageError(ValueError):
    """Stage failure that records itself on the stage-error channel at
    construction time — raise sites need no logging boilerplate, and
    callers that caught ValueError keep working."""

    def __init__(self, message: str, *args):
        _LOGGER.error("%s", message)
        super().__init__(message, *args)
