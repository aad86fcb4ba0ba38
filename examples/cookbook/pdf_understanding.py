"""Multipage-PDF understanding (reference notebooks 02/03): rasterize pages,
feed them as a multi-image prompt. The projector compresses every page to
<=256 tokens, so a 10-page document costs ~2.5K context."""

import argparse

from common import add_common_args, build_engine, chat_once

from aria_tpu.data.pdf import load_pdf_pages


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--pdf", required=True)
    ap.add_argument("--max-pages", type=int, default=8)
    ap.add_argument("--dpi", type=int, default=144)
    ap.add_argument("--prompt", default="Summarize this document.")
    args = ap.parse_args()

    engine, tokenizer, _ = build_engine(args)
    pages = load_pdf_pages(args.pdf, dpi=args.dpi, max_pages=args.max_pages)
    print(f"# {len(pages)} pages rasterized")
    print(chat_once(engine, tokenizer, args.prompt, pages, args))


if __name__ == "__main__":
    main()
