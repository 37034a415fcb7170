"""Speech Commands train/valid/test folder split.

Rebuild of ``datasets/speech_commands/split_dataset.py``: moves files listed
in ``validation_list.txt`` / ``testing_list.txt`` out of the extracted
Speech Commands archive into ``valid/`` and ``test/`` sibling folders (the
remainder becomes ``train/``).
"""

from __future__ import annotations

import argparse
import os
import shutil


def move_files(src_folder: str, to_folder: str, list_file: str):
    with open(list_file) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            dirname = os.path.dirname(line)
            dest = os.path.join(to_folder, dirname)
            os.makedirs(dest, exist_ok=True)
            src = os.path.join(src_folder, line)
            if os.path.exists(src):
                shutil.move(src, dest)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="folder of the extracted speech_commands archive")
    p.add_argument("--out", default=None, help="output base (default: root's parent)")
    args = p.parse_args(argv)

    base = args.out or os.path.dirname(os.path.abspath(args.root))
    valid_dir = os.path.join(base, "valid")
    test_dir = os.path.join(base, "test")
    train_dir = os.path.join(base, "train")
    move_files(args.root, valid_dir, os.path.join(args.root, "validation_list.txt"))
    move_files(args.root, test_dir, os.path.join(args.root, "testing_list.txt"))
    if os.path.abspath(args.root) != os.path.abspath(train_dir):
        os.makedirs(os.path.dirname(train_dir), exist_ok=True)
        shutil.move(args.root, train_dir)
    print(f"split into {train_dir}, {valid_dir}, {test_dir}")


if __name__ == "__main__":
    main()
