"""Reference-compatible namespace alias: ``supervillain_tpu.generator`` mirrors the
reference's ``supervillain.generator`` layout on top of :mod:`..generators`."""

from ..generators.base import Generator, DoNothing
from ..generators.combining import Sequentially, KeepEvery
from ..generators.monitor import Logger
from ..generators import villain
from ..generators import worldline
from ..generators import combining
