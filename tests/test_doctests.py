"""Docstring examples run as tests (the reference executes its documentation
via sphinx doctests; this is the no-extra-dependency equivalent).  Every
module listed here has its `>>>` examples executed; a module with zero
examples fails the battery so the list stays honest."""

import doctest

import pytest

MODULES = [
    'supervillain_tpu.analysis.uncertain',
    'supervillain_tpu.analysis.scaling',
    'supervillain_tpu.cli',
]


@pytest.mark.parametrize('modname', MODULES)
def test_module_doctests(modname):
    import importlib
    mod = importlib.import_module(modname)
    results = doctest.testmod(mod, verbose=False,
                              optionflags=doctest.ELLIPSIS)
    assert results.attempted > 0, f'{modname} has no doctest examples'
    assert results.failed == 0, f'{modname}: {results.failed} doctest failures'
