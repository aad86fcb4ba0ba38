"""Multiple images in one prompt (reference notebook 01_multi_images.ipynb):
every image becomes its own <fim_prefix><|img|>...<fim_suffix> block, features
scatter into the prompt in order."""

import argparse

from PIL import Image

from common import add_common_args, build_engine, chat_once


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--images", nargs="+", required=True)
    ap.add_argument("--prompt", default="Compare these images.")
    args = ap.parse_args()

    engine, tokenizer, _ = build_engine(args)
    imgs = [Image.open(p).convert("RGB") for p in args.images]
    print(chat_once(engine, tokenizer, args.prompt, imgs, args))


if __name__ == "__main__":
    main()
