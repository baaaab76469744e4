"""Freeze golden markdown fixtures (sha256 per url) from the canonical
pure-Python pipeline over the seed=42 corpus.

Run once (and re-run deliberately when extraction semantics change):
    python fixtures/freeze_goldens.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from smoldocling_ocr_spark.functions.extract import extract_document  # noqa: E402
from smoldocling_ocr_spark.sources.corpus import generate_rows  # noqa: E402

N_DOCS = 60  # matches sf0.001 corpus size


def main() -> None:
    rows = generate_rows(N_DOCS)
    goldens = {}
    samples = {}
    for r in rows:
        res = extract_document(r["url"], r["warc_ts"], r["html"], r["text"])
        goldens[r["url"]] = hashlib.sha256(res["markdown"].encode("utf-8")).hexdigest()
        if len(samples) < 3:
            samples[r["url"]] = res["markdown"]

    out = os.path.join(os.path.dirname(__file__), "goldens_sha256.json")
    with open(out, "w") as f:
        json.dump(goldens, f, indent=1, sort_keys=True)
    print(f"wrote {len(goldens)} golden hashes to {out}")

    sample_dir = os.path.join(os.path.dirname(__file__), "golden_samples")
    os.makedirs(sample_dir, exist_ok=True)
    for url, md in samples.items():
        name = url.rsplit("/", 1)[-1].replace(".html", ".md")
        with open(os.path.join(sample_dir, name), "w") as f:
            f.write(md)
    print(f"wrote {len(samples)} full golden samples to {sample_dir}")


if __name__ == "__main__":
    main()
