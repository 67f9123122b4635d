"""Database sanity checks.

Reference parity: ``padertorch/contrib/data/utils.py`` —
``check_audio_files_exist`` walks an arbitrarily nested database dict
and asserts that every string value that looks like an audio file path
actually exists on disk.
"""
import os
from pathlib import Path

__all__ = ['check_audio_files_exist']


def check_audio_files_exist(
        database_dict,
        speedup=None,
        extensions=('.wav', '.wv2', '.wv1', '.flac'),
):
    """Assert every audio path in a nested database dict exists.

    No structure is assumed: every string/Path value (at any nesting
    depth, also inside lists) ending in one of ``extensions`` is
    checked.  Raises ``AssertionError`` naming the first missing file
    and its key path.

    Args:
        database_dict: arbitrarily nested dict/list structure (e.g. a
            loaded database JSON).
        speedup: ``None`` (sequential) or ``'thread'`` (thread pool —
            the checks are pure IO).
        extensions: filename suffixes that mark a value as an audio
            file path.

    >>> import tempfile, os
    >>> d = tempfile.mkdtemp()
    >>> open(os.path.join(d, 'a.wav'), 'w').close()
    >>> check_audio_files_exist(
    ...     {'datasets': {'train': {'ex1': {
    ...         'audio_path': os.path.join(d, 'a.wav')}}}})
    >>> check_audio_files_exist({'x': [1, 'missing.wav']})  # doctest: +ELLIPSIS
    Traceback (most recent call last):
    ...
    AssertionError: ('missing.wav', ('x', '1'))...
    >>> check_audio_files_exist({'no': 'audio values'})  # doctest: +ELLIPSIS
    Traceback (most recent call last):
    ...
    AssertionError: Expect at least one audio file...
    """

    def is_audio_path(value):
        return (
            isinstance(value, (str, Path))
            and str(value).endswith(tuple(extensions))
        )

    def walk(obj, key_path):
        if isinstance(obj, dict):
            for k, v in obj.items():
                yield from walk(v, key_path + (str(k),))
        elif isinstance(obj, (list, tuple)):
            for i, v in enumerate(obj):
                yield from walk(v, key_path + (str(i),))
        elif is_audio_path(obj):
            yield key_path, obj

    if is_audio_path(database_dict):
        to_check = {(): database_dict}
    else:
        to_check = dict(walk(database_dict, ()))

    assert len(to_check) > 0, (
        f'Expect at least one audio file. It is likely that the '
        f'database dict is empty or was built from an empty folder. '
        f'to_check: {to_check}'
    )

    def body(item):
        key_path, file = item
        assert Path(file).exists(), (str(file), key_path)

    if speedup == 'thread':
        from multiprocessing.pool import ThreadPool
        with ThreadPool(os.cpu_count() or 1) as pool:
            for _ in pool.imap_unordered(body, to_check.items()):
                pass
    elif speedup is None:
        for item in to_check.items():
            body(item)
    else:
        raise ValueError(speedup, type(speedup))
