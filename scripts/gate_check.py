"""Accuracy-gate check: did the experiment reach the VQA v2 bar?

Reads the hparams record that `main.py` val mode appends to
``checkpoint/<exp>/scalars.jsonl`` (training/logging.py add_hparams) and
compares ``hparam/score`` against the threshold — the reference's published
Up-Down base All-accuracy is 55.83 (`/root/reference/README.md:39`,
BASELINE.md). Exit code 0 = gate passed.

Usage: python scripts/gate_check.py checkpoint/updown_vqa_gate [--threshold 55.8]
"""

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir", help="checkpoint/<exp> directory")
    ap.add_argument("--threshold", type=float, default=55.8,
                    help="required All accuracy in percent")
    args = ap.parse_args(argv)

    path = os.path.join(args.exp_dir, "scalars.jsonl")
    score = None
    breakdown = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            metrics = rec.get("metrics")
            if metrics and "hparam/score" in metrics:
                score = float(metrics["hparam/score"]) * 100
                breakdown = {k: float(v) * 100 for k, v in metrics.items()
                             if k != "hparam/score"}
    if score is None:
        print(f"no hparam/score record in {path} — run `--mode val` first")
        return 2
    for k, v in sorted(breakdown.items()):
        print(f"{k}: {v:.2f}")
    verdict = "PASS" if score >= args.threshold else "FAIL"
    print(f"All: {score:.2f} vs gate {args.threshold:.2f} -> {verdict}")
    return 0 if verdict == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
