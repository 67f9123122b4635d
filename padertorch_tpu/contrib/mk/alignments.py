"""Praat TextGrid alignment reading for dataset pipelines.

Reference parity: ``padertorch/contrib/mk/alignments.py``
(``TextGridAlignmentReader``).  The reference depends on the external
``praat-textgrids`` package; here a small stdlib parser handles both the
long ("ooTextFile") and short TextGrid formats, so no extra dependency
is needed.
"""
from dataclasses import dataclass
from pathlib import Path
from typing import Union
import logging
import re

import numpy as np

from padertorch_tpu.configurable import Configurable
from padertorch_tpu.data.dataset import FilterException

LOG = logging.getLogger('pt.contrib.mk.labels')

__all__ = ['read_textgrid', 'TextGridAlignmentReader']


def _tokenize_textgrid(text):
    """Yield strings and numbers from a TextGrid body (both formats)."""
    # strings are double-quoted (Praat escapes " as ""), everything else
    # is whitespace-separated numbers or keywords
    token_re = re.compile(r'"(?:[^"]|"")*"|[^\s\[\]=]+')
    for m in token_re.finditer(text):
        tok = m.group(0)
        if tok.startswith('"'):
            yield ('str', tok[1:-1].replace('""', '"'))
        else:
            try:
                yield ('num', float(tok))
            except ValueError:
                yield ('kw', tok)


def read_textgrid(path):
    """Parse a TextGrid file -> {tier_name: [(xmin, xmax, text), ...]}.

    Interval tiers yield (xmin, xmax, text); point tiers yield
    (time, time, text) marked by ``tier_types[name] == 'TextTier'``.

    Returns:
        (tiers, tier_types): dicts keyed by tier name.
    """
    text = Path(path).read_text(encoding='utf-8', errors='replace')
    tokens = list(_tokenize_textgrid(text))
    # strip header: find each tier start by class token "IntervalTier" /
    # "TextTier"; the token after is the tier name, then xmin xmax n
    tiers = {}
    tier_types = {}
    i = 0
    while i < len(tokens):
        kind, val = tokens[i]
        if kind == 'str' and val in ('IntervalTier', 'TextTier'):
            cls = val
            # next string token is the name
            j = i + 1
            while j < len(tokens) and tokens[j][0] != 'str':
                j += 1
            if j >= len(tokens):
                break
            name = tokens[j][1]
            # collect following numbers: xmin xmax n, then entries
            nums = []
            k = j + 1
            entries = []
            if cls == 'IntervalTier':
                # pattern per interval: num num str
                while k < len(tokens):
                    if (tokens[k][0] == 'str'
                            and tokens[k][1] in ('IntervalTier',
                                                 'TextTier')):
                        break
                    if tokens[k][0] == 'num':
                        nums.append(tokens[k][1])
                    elif tokens[k][0] == 'str':
                        if len(nums) >= 2:
                            entries.append(
                                (nums[-2], nums[-1], tokens[k][1]))
                        nums = []
                    k += 1
            else:
                # point tier: num str per point
                while k < len(tokens):
                    if (tokens[k][0] == 'str'
                            and tokens[k][1] in ('IntervalTier',
                                                 'TextTier')):
                        break
                    if tokens[k][0] == 'num':
                        nums.append(tokens[k][1])
                    elif tokens[k][0] == 'str':
                        if nums:
                            entries.append(
                                (nums[-1], nums[-1], tokens[k][1]))
                        nums = []
                    k += 1
            tiers[name] = entries
            tier_types[name] = cls
            i = k
        else:
            i += 1
    return tiers, tier_types


@dataclass
class TextGridAlignmentReader(Configurable):
    """Load alignments (phones, syllables, ...) from Praat TextGrid files.

    ``ali_root`` layout: ``ali_root/<speaker_id>/<example_id>.TextGrid``.

    Args:
        ali_root: Root directory of the alignment files.
        label_key: Tier name to read; also the key the labels are stored
            under in the example.
        to_array: Convert labels/times to numpy arrays.
        reduce_labels: Strip Praat's suffix digit classifiers from labels.
        verbose: Log a warning when an example has no alignment file.
        drop_silence: Drop intervals labeled ``silence_label``.
        silence_label: Label(s) regarded as silence.
    """

    ali_root: Union[str, Path]
    label_key: str
    to_array: bool = False
    reduce_labels: bool = True
    verbose: bool = False
    drop_silence: bool = False
    silence_label: Union[str, list] = 'SIL'

    def __post_init__(self):
        self.ali_root = Path(self.ali_root)

    def _path(self, example):
        return (self.ali_root / example['speaker_id']
                / example['example_id']).with_suffix('.TextGrid')

    def filter_fn(self, example):
        return self._path(example).exists()

    def __call__(self, example: dict):
        """Add ``<label_key>``, ``<label_key>_start_times`` and
        ``<label_key>_stop_times`` to the example; raises
        ``FilterException`` if the alignment file is missing."""
        example_id = example['example_id']
        try:
            tiers, tier_types = read_textgrid(self._path(example))
        except FileNotFoundError as exc:
            if self.verbose:
                LOG.warning(
                    f'No alignment for {example_id}. Drop example.')
            raise FilterException() from exc
        if self.label_key not in tiers:
            raise KeyError(
                f'Tier {self.label_key!r} not in '
                f'{sorted(tiers)} ({self._path(example)})')
        if tier_types[self.label_key] == 'TextTier':
            raise TypeError(
                'PointTier is not supported. Convert it to an '
                'IntervalTier')
        start_times, stop_times, labels = [], [], []
        for xmin, xmax, text in tiers[self.label_key]:
            if self.drop_silence and text in self.silence_label:
                continue
            start_times.append(xmin)
            stop_times.append(xmax)
            if self.reduce_labels:
                text = re.sub(r'\d', '', text)
            labels.append(text)
        if self.to_array:
            start_times = np.array(start_times)
            stop_times = np.array(stop_times)
            labels = np.array(labels)
        example[f'{self.label_key}_start_times'] = start_times
        example[f'{self.label_key}_stop_times'] = stop_times
        example[self.label_key] = labels
        return example
