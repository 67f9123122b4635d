"""Download the datasets for the distance-estimator recipe.

Reference parity:
``contrib/examples/source_localization/distance_estimator/download.py``
— fetches the RIR database, LibriSpeech subsets and the LibriSpeech VAD
JSON.  This build environment has no network egress, so by default the
script prints the file list (``--dry_run`` is implied without
``--fetch``); with ``--fetch`` it downloads via urllib into the given
directories.

Run:
    python -m padertorch_tpu.contrib.examples.source_localization.distance_estimator.download \
        --libri_path /data/librispeech --rir_path /data/rirs --fetch
"""
import argparse
from pathlib import Path

LIBRI_URLS = [
    'https://www.openslr.org/resources/12/train-clean-100.tar.gz',
    'https://www.openslr.org/resources/12/dev-clean.tar.gz',
    'https://www.openslr.org/resources/12/test-clean.tar.gz',
]
VAD_JSON_URL = (
    'https://zenodo.org/record/7071619/files/'
    'speech_activity_librispeech.json'
)
RIR_URL = 'https://zenodo.org/record/5679070/files/async_wasn_rirs.tar.gz'


def plan(libri_path=None, rir_path=None, vad_json_path=None):
    """Return the (url, destination) pairs for the requested databases."""
    downloads = []
    if rir_path:
        downloads.append((RIR_URL, Path(rir_path)))
    if libri_path:
        downloads += [(url, Path(libri_path)) for url in LIBRI_URLS]
        vad_dest = Path(vad_json_path) if vad_json_path else (
            Path(libri_path) / 'speech_activity_librispeech.json')
        downloads.append((VAD_JSON_URL, vad_dest))
    return downloads


def fetch(url, destination):
    import shutil
    import tarfile
    import tempfile
    import urllib.request
    destination = Path(destination)
    if destination.suffix == '.json':
        destination.parent.mkdir(parents=True, exist_ok=True)
        with urllib.request.urlopen(url) as response:
            destination.write_bytes(response.read())
        return
    destination.mkdir(parents=True, exist_ok=True)
    with tempfile.NamedTemporaryFile(suffix='.tar.gz') as tmp:
        with urllib.request.urlopen(url) as response:
            shutil.copyfileobj(response, tmp)
        tmp.flush()
        with tarfile.open(tmp.name) as archive:
            archive.extractall(destination)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--libri_path', default=None)
    parser.add_argument('--rir_path', default=None)
    parser.add_argument('--vad_json_path', default=None)
    parser.add_argument('--fetch', action='store_true',
                        help='actually download (needs network egress)')
    args = parser.parse_args()

    downloads = plan(args.libri_path, args.rir_path, args.vad_json_path)
    if not downloads:
        parser.error('specify --libri_path and/or --rir_path')
    for url, destination in downloads:
        if args.fetch:
            print(f'downloading {url} -> {destination}')
            fetch(url, destination)
        else:
            print(f'would download {url} -> {destination}')
    if not args.fetch:
        print('\n(pass --fetch to download; this environment has no '
              'network egress, so the list above is the contract)')


if __name__ == '__main__':
    main()
