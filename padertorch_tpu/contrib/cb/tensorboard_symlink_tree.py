"""Create a flat symlink tree of event files for tensorboard.

Reference parity: ``padertorch/contrib/cb/tensorboard_symlink_tree.py`` —
tensorboard is slow when pointed at a deep experiment tree; this mirrors
all tfevents files into one flat folder of symlinks.

Usage:
    python -m padertorch_tpu.contrib.cb.tensorboard_symlink_tree \
        '<storage_root>/*/events.out.tfevents.*' --out tb
"""
import argparse
from pathlib import Path

__all__ = ['make_symlink_tree', 'main']


def make_symlink_tree(patterns, out_dir):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    created = []
    for pattern in patterns:
        base = Path(pattern).anchor or '.'
        for path in Path(base).glob(str(Path(pattern).relative_to(base))):
            name = '__'.join(path.parts[-3:])
            link = out_dir / name
            if not link.exists():
                link.symlink_to(path.resolve())
                created.append(link)
    return created


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('patterns', nargs='+')
    parser.add_argument('--out', default='tb')
    args = parser.parse_args()
    created = make_symlink_tree(args.patterns, args.out)
    print(f'Created {len(created)} symlinks in {args.out}')


if __name__ == '__main__':
    main()
