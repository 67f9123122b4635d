"""Docs <-> bench honesty: every ``BENCH_r``-tagged number in the
numeric doc surfaces (``README.md`` and every ``doc/*.md``) must match
the graded artifact.

Convention (enforced here):

- ``(BENCH_rNN metric_name = X)`` — X must equal the ``value`` field of
  that metric's JSON line in ``BENCH_rNN.json``.
- ``(BENCH_rNN metric_name: key=X)`` — if ``key`` is a top-level
  numeric field of that metric's record (e.g.
  ``mfu_vs_v5e_bf16_peak``), X must equal it; otherwise the literal
  substring ``key=X`` must appear in the metric's ``unit`` string (for
  secondary numbers like ``scan=24.2`` or ``sequential=160.3``).
- Bare artifact-file mentions (``BENCH_r04.json``) are legal — they
  name a file, not a number.
- Any other ``BENCH_r<digits>`` occurrence in a covered doc is an
  error: un-checkable prose claims must not cite an artifact round.
  Generic mentions (``BENCH_r*.json``, ``BENCH_rN``) stay legal.

This is the automation the round-3 review asked for — extended in
round 5 from ``doc/performance.md`` alone to every numeric doc surface
(round-4 review item #4): stale prose numbers next to
differently-graded artifact values fail the default suite instead of
waiting for a human audit.
"""
import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]
DOCS = sorted((REPO / 'doc').glob('*.md')) + [REPO / 'README.md']

TAG = re.compile(
    r'\(BENCH_r(\d+)\s+([a-z0-9_]+)\s*'
    r'(?:=\s*([-+0-9.eE]+)|:\s*([a-z0-9_.-]+=[-+0-9.eE]+x?))\)')
FILE_MENTION = re.compile(r'BENCH_r\d+\.json')
ANY = re.compile(r'BENCH_r\d+')


def _load_metrics(round_no):
    path = REPO / f'BENCH_r{round_no:02d}.json'
    if not path.exists():
        pytest.fail(f'a doc cites {path.name}, '
                    f'but the artifact does not exist')
    tail = json.loads(path.read_text())['tail']
    metrics = {}
    for line in tail.splitlines():
        if line.startswith('{'):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if d.get('metric') == 'summary':
                for name, fields in d.get('all', {}).items():
                    metrics.setdefault(name, {}).update(
                        {'metric': name, **fields})
            elif 'metric' in d:
                metrics.setdefault(d['metric'], {}).update(d)
    return metrics


@pytest.mark.parametrize(
    'doc', DOCS, ids=[str(p.relative_to(REPO)) for p in DOCS])
def test_all_bench_citations_are_checkable_tags(doc):
    text = doc.read_text()
    legal_spans = [m.span() for m in TAG.finditer(text)]
    legal_spans += [m.span() for m in FILE_MENTION.finditer(text)]
    bad = []
    for m in ANY.finditer(text):
        if not any(lo <= m.start() < hi for lo, hi in legal_spans):
            line_no = text[:m.start()].count('\n') + 1
            bad.append(f'line {line_no}: {text[m.start():m.start()+60]!r}')
    assert not bad, (
        f'{doc.name}: un-checkable BENCH_r citations (use the '
        '(BENCH_rNN metric = X) tag convention so this suite can '
        'verify them):\n' + '\n'.join(bad))


def _check_tag(m, cache, errors, doc_name):
    round_no, metric, value, unit_claim = (
        int(m.group(1)), m.group(2), m.group(3), m.group(4))
    if round_no not in cache:
        cache[round_no] = _load_metrics(round_no)
    metrics = cache[round_no]
    if metric not in metrics:
        errors.append(
            f'{doc_name}: {metric} not in BENCH_r{round_no:02d}.json '
            f'(has: {sorted(metrics)})')
        return
    entry = metrics[metric]
    if value is not None:
        got, want = float(entry['value']), float(value)
        if abs(got - want) > 1e-9 * max(1.0, abs(got)):
            errors.append(
                f'{doc_name}: {metric}: doc says {value}, '
                f'BENCH_r{round_no:02d} says {entry["value"]}')
        return
    key, _, claimed = unit_claim.partition('=')
    if key in entry and isinstance(entry[key], (int, float)):
        got = float(entry[key])
        want = float(claimed.rstrip('x'))
        if abs(got - want) > 1e-9 * max(1.0, abs(got)):
            errors.append(
                f'{doc_name}: {metric}.{key}: doc says {claimed}, '
                f'BENCH_r{round_no:02d} says {entry[key]}')
    elif 'unit' not in entry:
        # the metric survived only via the compact summary line (the
        # driver keeps a 2000-char output tail; the summary makes
        # VALUES truncation-proof but deliberately drops the long unit
        # strings — carrying them would blow the tail and truncate the
        # summary itself).  A unit-substring claim is then unverifiable
        # from the artifact: do not fail a possibly-correct doc, but
        # do not count it as verified either.
        pass
    elif unit_claim not in entry['unit']:
        errors.append(
            f'{doc_name}: {metric}: {unit_claim!r} not found in unit '
            f'string {entry["unit"]!r}')


def test_tagged_numbers_match_artifact():
    cache = {}
    errors = []
    total = 0
    for doc in DOCS:
        text = doc.read_text()
        for m in TAG.finditer(text):
            total += 1
            _check_tag(m, cache, errors, doc.name)
    assert total, 'no BENCH tags found in any covered doc'
    assert not errors, 'doc <-> BENCH mismatches:\n' + '\n'.join(errors)
