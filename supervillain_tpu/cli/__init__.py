"""Command-line tooling (capability of /root/reference/supervillain/cli/:
ArgumentParser with default logging/metadata flags, the W type accepting 'inf', and
script-as-config loading)."""

from __future__ import annotations

import argparse
import importlib.util
import logging
import sys

from .. import meta
from .. import license as _license

#: Short banner (parser epilogs); --copyright prints the full document.
COPYRIGHT = f'supervillain-tpu {meta.version} ({meta.nickname})'
#: SPDX tag; --license prints the full text (reference cli/metadata.py:12-50
#: prints the complete license document, not a token).
LICENSE = 'MIT'


def W(value):
    """Parse the constraint integer, accepting 'inf', '∞', or 'infinity'.

    >>> W('2')
    2
    >>> W('inf')
    inf
    >>> W('∞')
    inf
    >>> W('0')
    Traceback (most recent call last):
        ...
    argparse.ArgumentTypeError: W must be a positive integer or inf, got 0
    """
    if str(value).lower() in ('inf', 'infinity', '∞'):
        return float('inf')
    w = int(value)
    if w < 1:
        raise argparse.ArgumentTypeError(f'W must be a positive integer or inf, got {value}')
    return w


def input_file(path):
    """Load a user python file as a module — script-as-config
    (reference cli/__init__.py:72-91)."""
    spec = importlib.util.spec_from_file_location('input', path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


class _MetadataAction(argparse.Action):
    def __init__(self, option_strings, dest, text='', **kwargs):
        self.text = text
        super().__init__(option_strings, dest, nargs=0, **kwargs)

    def __call__(self, parser, namespace, values, option_string=None):
        print(self.text)
        parser.exit()


from . import log as log  # noqa: E402  (submodule; reference-compatible name)


def _log_parent():
    return log.defaults()


def _metadata_parent():
    parent = argparse.ArgumentParser(add_help=False)
    parent.add_argument('--version', action=_MetadataAction, text=meta.version)
    parent.add_argument('--copyright', action=_MetadataAction,
                        text=_license.copyright())
    parent.add_argument('--license', action=_MetadataAction,
                        text=_license.license())
    return parent


class ArgumentParser(argparse.ArgumentParser):
    """argparse.ArgumentParser with default --log-level/--log-format and
    --version/--copyright/--license flags; parsing configures logging."""

    def __init__(self, *args, **kwargs):
        parents = list(kwargs.pop('parents', ()))
        parents += [_log_parent(), _metadata_parent()]
        kwargs.setdefault('epilog', COPYRIGHT)
        super().__init__(*args, parents=parents, **kwargs)

    def parse_args(self, *args, **kwargs):
        parsed = super().parse_args(*args, **kwargs)
        if hasattr(parsed, 'log_level'):
            log.configure(level=parsed.log_level, fmt=parsed.log_format,
                          stream=sys.stdout)
        return parsed
