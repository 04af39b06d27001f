"""value(err) uncertainty formatting (capability of
/root/reference/supervillain/analysis/uncertain.py:33-287)."""

from __future__ import annotations

import math
import re


class Uncertain:
    r"""A central value with an uncertainty, formatted NIST-style: ``1.234(56)``.

    The format-spec mini-language supports::

        [+][.precision][e|f][u digits]

    * ``u<digits>`` — significant digits of the uncertainty shown in parentheses
      (default 2); the value's precision follows the uncertainty's last digit.
    * ``.<precision>`` — fix the number of decimals of the value instead.
    * ``e`` — scientific notation with the common exponent outside the parentheses.
    * ``+`` — force a leading sign.

    Examples
    --------
    >>> f'{Uncertain(1.23456, 0.00321)}'
    '1.2346(32)'
    >>> f'{Uncertain(1.23456, 0.00321):u1}'
    '1.235(3)'
    >>> f'{Uncertain(12345.6, 321):e}'
    '1.23456(321)e+04'
    """

    def __init__(self, mean, uncertainty):
        self.mean = float(mean)
        self.uncertainty = abs(float(uncertainty))

    def __repr__(self):
        return f'Uncertain({self.mean}, {self.uncertainty})'

    def __str__(self):
        return format(self, '')

    _spec = re.compile(r'^(?P<sign>\+?)(?:\.(?P<precision>\d+))?(?P<mode>[ef]?)(?:u(?P<udigits>\d+))?$')

    def __format__(self, spec):
        m = self._spec.match(spec)
        if not m:
            raise ValueError(f'Invalid format spec {spec!r} for Uncertain')
        sign = '+' if m['sign'] else '-'
        udigits = int(m['udigits']) if m['udigits'] else 2
        mode = m['mode'] or 'f'
        precision = int(m['precision']) if m['precision'] else None

        value, err = self.mean, self.uncertainty

        if err == 0 or not math.isfinite(err):
            if precision is not None:
                return f'{value:{sign}.{precision}{mode}}({err})'
            return f'{value:{sign}{mode if mode == "e" else ""}}({err})'

        if mode == 'e':
            exponent = math.floor(math.log10(abs(value))) if value != 0 else 0
            scaled_v = value / 10 ** exponent
            scaled_e = err / 10 ** exponent
            if precision is None:
                # Decimals so the error shows `udigits` significant digits.
                err_exp = math.floor(math.log10(scaled_e))
                decimals = max(0, udigits - 1 - err_exp)
            else:
                decimals = precision
            err_digits = math.floor(scaled_e * 10 ** decimals + 0.5)
            return f'{scaled_v:{sign}.{decimals}f}({err_digits:d})e{exponent:+03d}'

        if precision is None:
            err_exp = math.floor(math.log10(err))
            decimals = max(0, udigits - 1 - err_exp)
        else:
            decimals = precision
        err_digits = math.floor(err * 10 ** decimals + 0.5)
        if decimals == 0:
            return f'{value:{sign}.0f}({err_digits:d})'
        return f'{value:{sign}.{decimals}f}({err_digits:d})'
