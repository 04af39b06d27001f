"""CLI tooling tests (capability of /root/reference/supervillain/cli/ exercised the
way the reference's scripts use it)."""

import argparse

import pytest

import supervillain_tpu as sv
from supervillain_tpu import cli


@pytest.mark.parametrize('text,expected', [
    ('1', 1), ('3', 3), ('inf', float('inf')), ('Inf', float('inf')),
    ('infinity', float('inf')), ('∞', float('inf')),
])
def test_W_parser(text, expected):
    assert cli.W(text) == expected


@pytest.mark.parametrize('bad', ['0', '-2'])
def test_W_parser_rejects_nonpositive(bad):
    with pytest.raises(argparse.ArgumentTypeError):
        cli.W(bad)


def test_W_parser_rejects_garbage():
    with pytest.raises(ValueError):
        cli.W('banana')


def test_argument_parser_default_flags():
    parser = cli.ArgumentParser(description='test')
    parser.add_argument('--N', type=int, default=5)
    args = parser.parse_args(['--N', '7', '--log-level', 'INFO'])
    assert args.N == 7
    assert args.log_level == 'INFO'


@pytest.mark.parametrize('flag', ['--version', '--copyright', '--license'])
def test_metadata_flags_print_and_exit(flag, capsys):
    parser = cli.ArgumentParser(description='test')
    with pytest.raises(SystemExit):
        parser.parse_args([flag])
    assert capsys.readouterr().out.strip()


def test_license_flag_prints_full_text(capsys):
    """--license prints the complete license document (reference
    cli/metadata.py:12-50 + license.py read the shipped LICENSE file), not a
    one-word SPDX token; --copyright includes the banner and the text; both
    round-trip the repo-root LICENSE file."""
    import pathlib
    import supervillain_tpu.license as lic

    parser = cli.ArgumentParser(description='test')
    with pytest.raises(SystemExit):
        parser.parse_args(['--license'])
    text = capsys.readouterr().out
    assert 'MIT License' in text
    assert 'WITHOUT WARRANTY OF ANY KIND' in text
    root = pathlib.Path(lic.__file__).parent.parent / 'LICENSE'
    assert text.strip() == root.read_text().strip()

    parser = cli.ArgumentParser(description='test')
    with pytest.raises(SystemExit):
        parser.parse_args(['--copyright'])
    text = capsys.readouterr().out
    assert 'supervillain-tpu' in text and 'MIT License' in text

    # The embedded fallback matches the shipped file (installed w/o checkout).
    assert lic._MIT.strip() == root.read_text().strip()


def test_input_file_loads_module(tmp_path):
    path = tmp_path / 'config.py'
    path.write_text('import supervillain_tpu as sv\n'
                    'L = sv.Lattice2D(4)\n'
                    'S = sv.Villain(L, 0.5, W=1)\n')
    module = cli.input_file(str(path))
    assert module.L.N == 4
    assert module.S.kappa == 0.5


def test_main_banner():
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, '-m', 'supervillain_tpu', '--version'],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    assert sv.meta.version in out.stdout


def test_log_format_presets(capsys):
    """--log-format accepts named presets (plain/timed/json/...) in addition to
    raw %-style strings (richer than the reference's single format string)."""
    import json as _json
    import logging
    from supervillain_tpu.cli import log

    for preset in log.FORMATS:
        f = log.formatter(preset)
        assert isinstance(f, logging.Formatter)

    rec = logging.LogRecord('test', logging.INFO, __file__, 1, 'hello %s', ('x',), None)
    assert log.formatter('plain').format(rec) == 'INFO: hello x'
    payload = _json.loads(log.formatter('json').format(rec))
    assert payload['message'] == 'hello x' and payload['level'] == 'INFO'
    # Raw format strings still work.
    assert log.formatter('%(levelname)s|%(message)s').format(rec) == 'INFO|hello x'


def test_argument_parser_configures_named_format():
    import logging
    import supervillain_tpu as sv
    p = sv.cli.ArgumentParser(description='t')
    p.parse_args(['--log-level', 'INFO', '--log-format', 'plain'])
    root = logging.getLogger()
    assert root.level == logging.INFO
    assert any('%(levelname)s: %(message)s' == getattr(h.formatter, '_fmt', None)
               for h in root.handlers)


def test_module_entry_point_metadata_flags():
    """`python -m supervillain_tpu --license` (and friends) print-and-exit
    through the metadata parser, exactly like the reference's module entry
    point (reference supervillain/__main__.py:1-13); bare invocation still
    prints the banner."""
    import pathlib
    import subprocess
    import sys
    root = pathlib.Path(__file__).resolve().parents[1]
    out = subprocess.run([sys.executable, '-m', 'supervillain_tpu', '--license'],
                         cwd=root, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0
    assert 'MIT License' in out.stdout and 'Permission' in out.stdout
    assert 'lattice Monte Carlo' not in out.stdout      # exited before banner
    out = subprocess.run([sys.executable, '-m', 'supervillain_tpu', '--version'],
                         cwd=root, capture_output=True, text=True, timeout=300)
    assert out.stdout.strip().endswith(tuple('0123456789'))
    out = subprocess.run([sys.executable, '-m', 'supervillain_tpu'],
                         cwd=root, capture_output=True, text=True, timeout=300)
    assert 'supervillain-tpu' in out.stdout              # the banner
