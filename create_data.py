"""Build dataset/train_list.txt from CN-Celeb (+ CN-Celeb2)
(reference ``create_data.py`` behavior: CN-Celeb speakers with id < 800 go
to the train list; CN-Celeb2 labels are offset by 800)."""

import argparse
import functools
import os

from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("cn_celeb_dir",  str, "dataset/CN-Celeb_flac/data",  "CN-Celeb data dir")
add_arg("cn_celeb2_dir", str, "dataset/CN-Celeb2_flac/data", "CN-Celeb2 data dir")
add_arg("list_path",     str, "dataset/train_list.txt", "output list path")
args = parser.parse_args()
print_arguments(args=args)


def main():
    os.makedirs(os.path.dirname(args.list_path), exist_ok=True)
    lines = []
    n_cnceleb_train = 800
    if os.path.isdir(args.cn_celeb_dir):
        speakers = sorted(os.listdir(args.cn_celeb_dir))
        for spk_id, speaker in enumerate(speakers):
            if spk_id >= n_cnceleb_train:
                continue  # remaining speakers are the test split
            spk_dir = os.path.join(args.cn_celeb_dir, speaker)
            for name in sorted(os.listdir(spk_dir)):
                path = os.path.join(spk_dir, name).replace("\\", "/")
                lines.append(f"{path}\t{spk_id}")
    if os.path.isdir(args.cn_celeb2_dir):
        speakers = sorted(os.listdir(args.cn_celeb2_dir))
        for spk_id, speaker in enumerate(speakers):
            spk_dir = os.path.join(args.cn_celeb2_dir, speaker)
            for name in sorted(os.listdir(spk_dir)):
                path = os.path.join(spk_dir, name).replace("\\", "/")
                lines.append(f"{path}\t{spk_id + n_cnceleb_train}")
    with open(args.list_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} entries to {args.list_path}")


if __name__ == "__main__":
    main()
