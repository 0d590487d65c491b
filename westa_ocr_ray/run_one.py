"""One-shot debug extraction — `python -m westa_ocr_ray.run_one` — the
analog of the reference's admin one-shot path (app/admin.py:549-725:
upload one document, run the model once, inspect the result). No Ray
session: runs the pure extraction kernels directly.

Examples:
    python -m westa_ocr_ray.run_one --media-ref media://pdf/doc_42_00000099/1
    python -m westa_ocr_ray.run_one --html-file page.html
    python -m westa_ocr_ray.run_one --text "some raw  text"
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="one-shot debug extraction")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--media-ref", help="media:// ref resolved via the media store")
    g.add_argument("--html-file", help="path to an HTML file to boilerplate-strip")
    g.add_argument("--text", help="raw text to normalize")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    from . import extractors, fixtures

    units = []
    if args.media_ref:
        kind = "image" if args.media_ref.startswith("media://image/") else "pdf"
        try:
            blobs = extractors.split_payload(
                fixtures.media_store(args.media_ref, args.seed))
        except (extractors.MediaFormatError, OSError) as exc:
            print(json.dumps({"error": f"media split failed: {exc}"}))
            return 1
        for page_idx, blob in enumerate(blobs, start=1):
            text, is_content, error = extractors.extract_unit(kind, "", blob)
            units.append({"page_idx": page_idx, "kind": kind, "text": text,
                          "is_content": is_content, "error": error})
    elif args.html_file:
        with open(args.html_file, encoding="utf-8") as fh:
            html = fh.read()
        text, is_content, error = extractors.extract_unit("html", html, None)
        units.append({"page_idx": 0, "kind": "html", "text": text,
                      "is_content": is_content, "error": error})
    else:
        text, is_content, error = extractors.extract_unit("text", args.text, None)
        units.append({"page_idx": 0, "kind": "text", "text": text,
                      "is_content": is_content, "error": error})

    print(json.dumps({"units": units}, ensure_ascii=False, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
