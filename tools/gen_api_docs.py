#!/usr/bin/env python
"""Generate the rendered API reference (docs/api/) from the package's live
docstrings — the no-extra-dependency stand-in for the reference's
sphinx-autodoc build (sphinx is not installable in this environment; the
docstring *content* is the documentation either way, and the doctest battery
tests/test_doctests.py executes the examples).

Run:  python tools/gen_api_docs.py        (writes docs/api/*.md + index)
The suite's tests/test_api_docs.py asserts the committed output is current.
"""

from __future__ import annotations

import importlib
import inspect
import pathlib
import pkgutil
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
OUT = ROOT / 'docs' / 'api'

SKIP_MODULES = {'supervillain_tpu.benchmark'}  # script-style entry points


def _first_paragraph(doc):
    if not doc:
        return ''
    doc = inspect.cleandoc(doc)
    return doc.split('\n\n')[0]


def _signature(obj):
    import re
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'
    # Object-default reprs embed process-specific state (memory addresses,
    # captured streams, possibly nested like <TextIOWrapper name='<stdout>'>);
    # normalize to a fixpoint so the generated pages are deterministic.
    while re.search(r'<[^<>]*>', sig):
        sig = re.sub(r'<[^<>]*>', '\0', sig)
    return sig.replace('\0', '<...>')


def _public_members(mod):
    names = getattr(mod, '__all__', None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith('_')]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if getattr(obj, '__module__', None) != mod.__name__:
            continue  # re-exports documented at their home module
        if inspect.isclass(obj) or inspect.isfunction(obj):
            out.append((n, obj))
    return out


def render_module(modname):
    mod = importlib.import_module(modname)
    lines = [f'# `{modname}`', '']
    if mod.__doc__:
        lines += [inspect.cleandoc(mod.__doc__), '']
    members = _public_members(mod)
    for name, obj in members:
        if inspect.isclass(obj):
            lines += [f'## class `{name}{_signature(obj)}`', '']
            para = _first_paragraph(obj.__doc__)
            if para:
                lines += [para, '']
            for mname, meth in inspect.getmembers(obj, inspect.isfunction):
                if mname.startswith('_') or meth.__qualname__.split('.')[0] != name:
                    continue
                lines += [f'### `{name}.{mname}{_signature(meth)}`', '']
                mpara = _first_paragraph(meth.__doc__)
                if mpara:
                    lines += [mpara, '']
        else:
            lines += [f'## `{name}{_signature(obj)}`', '']
            para = _first_paragraph(obj.__doc__)
            if para:
                lines += [para, '']
    return '\n'.join(lines).rstrip() + '\n', len(members)


def iter_modules():
    import supervillain_tpu
    yield 'supervillain_tpu'
    for info in pkgutil.walk_packages(supervillain_tpu.__path__,
                                      prefix='supervillain_tpu.'):
        if any(info.name == s or info.name.startswith(s + '.')
               for s in SKIP_MODULES):
            continue
        yield info.name


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    index = ['# API reference', '',
             'Generated from the live docstrings by `tools/gen_api_docs.py`; '
             'regenerate after changing public signatures or module '
             'docstrings (tests/test_api_docs.py keeps this honest).', '']
    written = []
    for modname in sorted(set(iter_modules())):
        text, n_members = render_module(modname)
        fname = modname.replace('.', '_') + '.md'
        (OUT / fname).write_text(text)
        written.append(fname)
        label = modname + (f' ({n_members} public members)' if n_members else '')
        index.append(f'- [`{modname}`]({fname})')
    (OUT / 'index.md').write_text('\n'.join(index) + '\n')
    print(f'wrote {len(written)} module pages + index to {OUT}')


if __name__ == '__main__':
    main()
