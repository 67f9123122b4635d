"""Create JSON databases for WSJ0-2/3/4-mix.

Reference parity: ``padertorch/contrib/data/wsj0_mix/create_json.py`` —
walks the wsj0-mix directory layout (``.../{tr,cv,tt}/{mix,s1,s2,...}``)
and writes the database JSON consumed by ``JsonDatabase`` and the
separation recipes.
"""
import argparse
import json
import re
from pathlib import Path

__all__ = ['create_database_dict', 'check_audio_files_exist', 'main',
           'get_transcriptions', 'normalize_transcription',
           'load_spk2gender']

DATASET_NAMES = {
    'tr': 'mix_{k}_spk_min_tr',
    'cv': 'mix_{k}_spk_min_cv',
    'tt': 'mix_{k}_spk_min_tt',
}


def create_database_dict(mix_root, num_speakers=2, sample_rate=8000):
    """Walk ``<mix_root>/{tr,cv,tt}`` and build the database dict."""
    mix_root = Path(mix_root)
    datasets = {}
    for split, name_template in DATASET_NAMES.items():
        split_dir = mix_root / split
        if not split_dir.exists():
            continue
        mix_dir = split_dir / 'mix'
        examples = {}
        for wav in sorted(mix_dir.glob('*.wav')):
            example_id = wav.stem
            sources = [
                str(split_dir / f's{k + 1}' / wav.name)
                for k in range(num_speakers)
            ]
            examples[example_id] = {
                'audio_path': {
                    'observation': str(wav),
                    'speech_source': sources,
                },
                'num_speakers': num_speakers,
                'sample_rate': sample_rate,
            }
        datasets[name_template.format(k=num_speakers)] = examples
    return {'datasets': datasets}


def normalize_transcription(transcriptions, noise_word='<NOISE>'):
    """Clean raw WSJ transcripts the way Kaldi does (reference
    ``create_json.py:76``).  The reference downloads and shells out to
    Kaldi's ``normalize_transcript.pl``; this is the same rule set
    executed in-process (no Perl, no network):

    * upcase; drop backslashes; ``%PERCENT``/``.POINT`` -> words
    * positional noise markers ``[<w]``/``[w>]``/``[w/]``/``[/w]``,
      the truncation mark ``~`` and the pause mark ``.`` are deleted
    * other bracketed noises ``[w]`` -> ``noise_word``
    * verbally-deleted-but-pronounced ``<word>`` -> ``word``
    * ``--DASH`` -> ``-DASH``

    >>> normalize_transcription({'u1': 'the [loud_breath] ~ <and> . --DASH cat\\\\'})
    {'u1': 'THE <NOISE> AND -DASH CAT'}
    """
    result = {}
    for utt_id, trans in transcriptions.items():
        words = []
        for w in trans.split():
            w = w.upper().replace('\\', '')
            if w == '%PERCENT':
                w = 'PERCENT'
            elif w == '.POINT':
                w = 'POINT'
            if (re.fullmatch(r'\[<\w+\]', w)
                    or re.fullmatch(r'\[\w+>\]', w)
                    or re.fullmatch(r'\[\w+/\]', w)
                    or re.fullmatch(r'\[/\w+\]', w)
                    or w in ('~', '.')):
                continue
            if re.fullmatch(r'\[\w+\]', w):
                words.append(noise_word)
                continue
            m = re.fullmatch(r"<([\w']+)>", w)
            if m:
                words.append(m.group(1))
                continue
            if w == '--DASH':
                words.append('-DASH')
                continue
            words.append(w)
        result[utt_id] = ' '.join(words)
    return result


def get_transcriptions(wsj0_root):
    """Collect per-utterance transcripts from WSJ ``*.dot``/``*.ptx``
    files (reference ``create_json.py:100``): lines are
    ``<transcript> (<utt_id>)``; ``.ptx`` files are only used when no
    sibling ``.dot`` exists."""
    wsj0_root = Path(wsj0_root)
    word = {}
    dot_files = list(wsj0_root.rglob('*.dot'))
    ptx_files = [
        p for p in wsj0_root.rglob('*.ptx')
        if Path(str(p).replace('.ptx', '.dot')) not in dot_files
    ]
    for file_path in dot_files + ptx_files:
        matches = re.findall(
            r'^(.+)\s+\((\S+)\)$', file_path.read_text(), flags=re.M)
        word.update({utt_id: trans for trans, utt_id in matches})
    return normalize_transcription(word)


def load_spk2gender(spk2gender_file):
    """Parse a Kaldi ``spk2gender`` file into
    ``{speaker: 'male'|'female'}`` (reference ``create_json.py:117``)."""
    spk2gender = {}
    with Path(spk2gender_file).open() as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            spk2gender[parts[0]] = (
                'male' if parts[1].lower() == 'm' else 'female')
    return spk2gender


def check_audio_files_exist(database_dict, speedup=None):
    """Assert every referenced audio file exists.

    Reference parity: ``contrib/data/utils.py:5``.
    """
    del speedup
    missing = []

    def walk(obj):
        if isinstance(obj, dict):
            for v in obj.values():
                walk(v)
        elif isinstance(obj, list):
            for v in obj:
                walk(v)
        elif isinstance(obj, str) and obj.endswith('.wav'):
            if not Path(obj).exists():
                missing.append(obj)

    walk(database_dict)
    assert not missing, (
        f'{len(missing)} audio files are missing, e.g. {missing[:5]}')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('mix_root')
    parser.add_argument('--output', default='wsj0_mix.json')
    parser.add_argument('--num_speakers', type=int, default=2)
    parser.add_argument('--sample_rate', type=int, default=8000)
    parser.add_argument('--skip_check', action='store_true')
    args = parser.parse_args()
    database = create_database_dict(
        args.mix_root, num_speakers=args.num_speakers,
        sample_rate=args.sample_rate)
    if not args.skip_check:
        check_audio_files_exist(database)
    Path(args.output).write_text(json.dumps(database, indent=2))
    n = sum(len(v) for v in database['datasets'].values())
    print(f'Wrote {args.output} with {n} examples in '
          f'{len(database["datasets"])} datasets.')


if __name__ == '__main__':
    main()
