"""The committed API reference (docs/api/) must match the live docstrings —
regenerating into a scratch directory and diffing keeps the rendered docs
honest (the no-sphinx equivalent of a docs build in CI)."""

import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_api_docs_are_current(tmp_path, monkeypatch):
    sys.path.insert(0, str(ROOT / 'tools'))
    import gen_api_docs

    monkeypatch.setattr(gen_api_docs, 'OUT', tmp_path)
    gen_api_docs.main()

    committed = ROOT / 'docs' / 'api'
    fresh = sorted(p.name for p in tmp_path.glob('*.md'))
    assert fresh == sorted(p.name for p in committed.glob('*.md')), \
        'module set changed: rerun tools/gen_api_docs.py'
    stale = [name for name in fresh
             if (tmp_path / name).read_text() != (committed / name).read_text()]
    assert not stale, f'stale API docs (rerun tools/gen_api_docs.py): {stale}'
