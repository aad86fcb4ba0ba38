"""Single-image chat (reference README.md quickstart equivalent)."""

import argparse

from PIL import Image

from common import add_common_args, build_engine, chat_once


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", default="What's in this image?")
    args = ap.parse_args()

    engine, tokenizer, _ = build_engine(args)
    img = Image.open(args.image).convert("RGB")
    print(chat_once(engine, tokenizer, args.prompt, [img], args))


if __name__ == "__main__":
    main()
