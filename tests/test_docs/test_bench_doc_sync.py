"""Docs <-> bench honesty: every ``BENCH_r``-tagged number in
``doc/performance.md`` must match the graded artifact.

Convention (enforced here):

- ``(BENCH_rNN metric_name = X)`` — X must equal the ``value`` field of
  that metric's JSON line in ``BENCH_rNN.json``.
- ``(BENCH_rNN metric_name: key=X)`` — the literal substring ``key=X``
  must appear in that metric's ``unit`` string (for secondary numbers
  like ``scan=24.2`` or ``sequential=160.3``).
- Any other ``BENCH_r<digits>`` occurrence in the doc is an error:
  un-checkable prose claims must not cite an artifact round.  Generic
  mentions (``BENCH_r*.json``, ``BENCH_rN``) stay legal.

This is the automation the round-3 review asked for: stale prose
numbers next to differently-graded artifact values now fail the default
suite instead of waiting for a human audit.
"""
import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]
DOC = REPO / 'doc' / 'performance.md'

TAG = re.compile(
    r'\(BENCH_r(\d+)\s+([a-z0-9_]+)\s*'
    r'(?:=\s*([-+0-9.eE]+)|:\s*([a-z0-9_.-]+=[-+0-9.eE]+x?))\)')
ANY = re.compile(r'BENCH_r\d+')


def _load_metrics(round_no):
    path = REPO / f'BENCH_r{round_no:02d}.json'
    if not path.exists():
        pytest.fail(f'doc/performance.md cites {path.name}, '
                    f'but the artifact does not exist')
    tail = json.loads(path.read_text())['tail']
    metrics = {}
    for line in tail.splitlines():
        if line.startswith('{'):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if 'metric' in d:
                metrics[d['metric']] = d
    return metrics


def test_all_bench_citations_are_checkable_tags():
    text = DOC.read_text()
    tagged_spans = [m.span() for m in TAG.finditer(text)]
    bad = []
    for m in ANY.finditer(text):
        if not any(lo <= m.start() < hi for lo, hi in tagged_spans):
            line_no = text[:m.start()].count('\n') + 1
            bad.append(f'line {line_no}: {text[m.start():m.start()+60]!r}')
    assert not bad, (
        'Un-checkable BENCH_r citations (use the (BENCH_rNN metric = X) '
        'tag convention so this suite can verify them):\n'
        + '\n'.join(bad))


def test_tagged_numbers_match_artifact():
    text = DOC.read_text()
    tags = list(TAG.finditer(text))
    assert tags, 'doc/performance.md has no BENCH tags to check'
    errors = []
    cache = {}
    for m in tags:
        round_no, metric, value, unit_claim = (
            int(m.group(1)), m.group(2), m.group(3), m.group(4))
        if round_no not in cache:
            cache[round_no] = _load_metrics(round_no)
        metrics = cache[round_no]
        if metric not in metrics:
            errors.append(
                f'{metric} not in BENCH_r{round_no:02d}.json '
                f'(has: {sorted(metrics)})')
            continue
        entry = metrics[metric]
        if value is not None:
            got, want = float(entry['value']), float(value)
            if abs(got - want) > 1e-9 * max(1.0, abs(got)):
                errors.append(
                    f'{metric}: doc says {value}, '
                    f'BENCH_r{round_no:02d} says {entry["value"]}')
        else:
            if unit_claim not in entry.get('unit', ''):
                errors.append(
                    f'{metric}: {unit_claim!r} not found in unit '
                    f'string {entry.get("unit", "")!r}')
    assert not errors, 'doc <-> BENCH mismatches:\n' + '\n'.join(errors)
