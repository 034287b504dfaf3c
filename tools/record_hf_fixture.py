"""Record REAL transformers pipeline outputs into the HF wire fixture.

The committed ``tests/fixtures/hf_pipeline_wire_fixture.json`` is
HAND-AUTHORED: it reproduces the transformers text-classification output
SHAPES (dict vs 1-element list vs top_k=None full list, uppercase labels)
but its scores are invented, so the parity tests it feeds prove
WIRE-FORMAT handling (isinstance dispatch, argmax, lowercasing) — not
model-output parity. See the fixture's ``_provenance`` key and
``HF_FIXTURE_PROVENANCE.md`` next to it for why it cannot be recorded in
this container.

Run THIS script in any environment where ``transformers`` is importable
(weights download on first use) to replace the fixture with recorded real
outputs, provenance-stamped; the test suite consumes either variant
unchanged, and with a recorded fixture the same tests become genuine
model parity (reference ``sentiment_analysis.py:76-112``).

Usage:  python tools/record_hf_fixture.py [output_path]
"""

from __future__ import annotations

import datetime
import json
import os
import sys

# Must match the texts the wire-format tests exercise (empty string
# included: the truncation/fillna path).
TEXTS = [
    "the plan was a huge success and everyone celebrated",
    "the outage caused a terrible loss for the company",
    "markets were flat on tuesday",
    "",
]

SENTIMENT_MODEL = "distilbert-base-uncased-finetuned-sst-2-english"
EMOTION_MODEL = "j-hartmann/emotion-english-distilroberta-base"


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "hf_pipeline_wire_fixture.json",
    )
    try:
        import transformers
        from transformers import pipeline
    except ImportError as e:
        print(
            "transformers is not importable in this environment "
            f"({e}); cannot record real model outputs. The committed "
            "hand-authored wire-format fixture remains in place — see "
            "tests/fixtures/HF_FIXTURE_PROVENANCE.md.",
            file=sys.stderr,
        )
        return 1

    sent = pipeline("sentiment-analysis", model=SENTIMENT_MODEL, truncation=True)
    emo = pipeline(
        "text-classification", model=EMOTION_MODEL, top_k=None, truncation=True
    )
    fixture = {
        "_provenance": (
            "RECORDED from real transformers pipelines "
            f"(transformers=={transformers.__version__}, "
            f"sentiment={SENTIMENT_MODEL}, emotion={EMOTION_MODEL}) by "
            "tools/record_hf_fixture.py on "
            f"{datetime.datetime.now(datetime.timezone.utc).isoformat(timespec='seconds')}."
            " Raw per-text pipeline return values, shape-preserved."
        ),
        "sentiment": {t: sent(t) if t else sent([t])[0] for t in TEXTS},
        "emotion": {t: emo([t])[0] for t in TEXTS},
    }
    with open(out_path, "w") as f:
        json.dump(fixture, f, indent=1)
    print(f"recorded fixture written to {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
