"""Reference-compatible namespace: ``supervillain_tpu.performance`` mirrors the
reference's ``supervillain.performance`` (/root/reference/supervillain/performance/),
re-exporting the wall-clock :class:`Timer` from :mod:`.utils.timer`."""

from .utils.timer import Timer

__all__ = ['Timer']
