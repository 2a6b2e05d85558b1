"""Caption metric scoring CLI.

Port of `/root/reference/cap_eval.py:41-69`: reads ``checkpoint/<exp>/
decode.txt`` and a reference captions JSON, scores BLEU-1..4 / METEOR /
ROUGE-L / CIDEr, writes ``eval_result.txt``. Metrics come from the native
implementation in vqa_tpu/tools/metrics.py (pycocoevalcap is not available
in this environment; see that module's docstring for exact semantics).
"""

from __future__ import annotations

import argparse
import json
import os

from vqa_tpu.tools.metrics import score


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_ref", type=str,
                        default="../annot/VQA-E/val2014_captions.json")
    parser.add_argument("--load_path", type=str)
    return parser.parse_args()


def main():
    args = parse_args()
    hypotheses = {}
    index = 0
    print("Load predicted captions:", args.load_path)
    with open(os.path.join("checkpoint", args.load_path, "decode.txt")) as f:
        for s in f.read().split("\n"):
            if len(s) != 0:
                hypotheses[index] = [s.replace("<start> ", "")]
                index += 1

    references = {}
    index = 0
    print("Load target captions:", args.load_ref)
    with open(args.load_ref) as f:
        target = json.load(f)
        for s in target["data"]:
            c = s["c_word"]
            references[index] = c if isinstance(c, list) else [c]
            index += 1

    result = score(references, hypotheses)
    print("================================================")
    with open(os.path.join("checkpoint", args.load_path,
                           "eval_result.txt"), "w") as f:
        for k, v in result.items():
            output = f"{k}: {100 * v:.8f} %"
            print(output)
            f.write(output + "\n")


if __name__ == "__main__":
    main()
