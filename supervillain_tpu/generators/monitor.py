"""Monitoring wrapper (capability of
/root/reference/supervillain/generator/monitor.py:9-69)."""

from __future__ import annotations

import logging

from ..utils import Timer
from .base import Generator

logger = logging.getLogger(__name__)


class Logger(Generator):
    """Wrap a generator; time each stateful step and channel the result to a callback.

    Only meaningful for the stateful ``step_cfg`` shell — inside a jitted scan the
    per-step boundary does not exist (that is the point of the scan), so there the
    wrapper is transparent.
    """

    def __init__(self, generator, channel=logger.info, timer=True):
        self.generator = generator
        self.channel = channel
        self.timer = timer
        self.name = generator.name

    def __str__(self):
        return f'Logger({self.generator})'

    def init_stats(self):
        return self.generator.init_stats()

    def inline_shapes(self):
        return self.generator.inline_shapes()

    def step(self, key, cfg, stats):
        return self.generator.step(key, cfg, stats)

    def step_cfg(self, cfg):
        with Timer(self.channel if self.timer else None, f'{self.generator} step'):
            result = self.generator.step_cfg(cfg)
        if self.channel is not None:
            self.channel(result)
        return result

    def report(self, stats=None):
        return self.generator.report(stats)
