"""Generate METEOR module-3/4 tables from their public upstream corpora.

The METEOR 1.5 jar the reference wraps (via pycocoevalcap,
/root/reference/cap_eval.py:28) bundles two data files the scorer needs
for its synonym and paraphrase modules: WordNet synsets and the
paraphrase-en table (Denkowski & Lavie 2014). vqa_tpu implements all four
METEOR modules natively (vqa_tpu/tools/metrics.py) but cannot redistribute
those corpora; this script converts a user-supplied download of either
into the line formats ``load_synsets`` / ``load_paraphrases`` read, so a
jar-equivalent scoring setup is one command away:

    # WordNet 3.0 "WNdb" download (the dict/ directory with data.noun etc.)
    python scripts/make_meteor_tables.py synonyms \
        --wordnet_dir /path/to/WordNet-3.0/dict -o english.synsets

    # METEOR 1.5's data/paraphrase-en.gz (same file the jar loads)
    python scripts/make_meteor_tables.py paraphrases \
        --paraphrase_file /path/to/paraphrase-en.gz -o paraphrase-en.txt

    python cap_eval.py --load_path exp --synonym_path english.synsets \
        --paraphrase_path paraphrase-en.txt

For out-of-box scoring without any download, cap_eval.py defaults to the
bundled mini tables (vqa_tpu/tools/data/meteor_*_mini.txt) so all four
modules are exercised; this script is how users upgrade the mini tables to
the jar's full corpora.

Output formats (consumed by vqa_tpu.tools.metrics):
  synsets:     one synonym group per line, space-separated lowercase words
  paraphrases: one pair per line, ``phrase a ||| phrase b`` (lowercase)
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys


def parse_wordnet_synsets(wordnet_dir: str):
    """Parse WNdb ``data.{noun,verb,adj,adv}`` files into synonym groups.

    Each data-file line is ``synset_offset lex_filenum ss_type w_cnt
    word lex_id [word lex_id ...] p_cnt ...`` (wndb(5WN)); ``w_cnt`` is
    2-digit hex. METEOR's synonymy module matches single tokens, so
    multi-word lemmas (underscored collocations) are dropped, adjective
    syntactic markers ``(a|p|ip)`` stripped, and only groups with >= 2
    distinct single words are emitted.
    """
    groups = []
    seen = set()
    for part in ("noun", "verb", "adj", "adv"):
        path = os.path.join(wordnet_dir, f"data.{part}")
        if not os.path.exists(path):
            print(f"warning: {path} missing, skipping", file=sys.stderr)
            continue
        with open(path, encoding="utf-8", errors="replace") as f:
            for line in f:
                if line.startswith("  ") or not line.strip():
                    continue  # license header lines are space-indented
                fields = line.split()
                try:
                    w_cnt = int(fields[3], 16)
                except (IndexError, ValueError):
                    continue
                words = []
                for i in range(w_cnt):
                    w = fields[4 + 2 * i]  # every lemma is followed by lex_id
                    w = w.split("(", 1)[0].lower()  # strip (a)/(p)/(ip)
                    if w and "_" not in w and w not in words:
                        words.append(w)
                if len(words) >= 2:
                    key = tuple(sorted(words))
                    if key not in seen:
                        seen.add(key)
                        groups.append(words)
    return groups


def parse_paraphrase_table(path: str, min_weight: float = 0.0):
    """Parse METEOR 1.5's paraphrase-en(.gz) into (phrase_a, phrase_b) pairs.

    Accepts the shipped ``|||``-separated format in any of its field
    arrangements (2 fields; or 3 with a numeric weight first or last) and
    plain tab-separated pairs, so minor packaging differences between
    METEOR releases all load. ``min_weight`` filters weighted rows.
    """
    opener = gzip.open if path.endswith(".gz") else open
    pairs = []
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "|||" in line:
                fields = [p.strip() for p in line.split("|||")]
            elif "\t" in line:
                fields = [p.strip() for p in line.split("\t")]
            else:
                continue
            weight = None
            if len(fields) == 3:
                for idx in (0, -1):
                    try:
                        weight = float(fields[idx])
                    except ValueError:
                        continue
                    del fields[idx]
                    break
            if len(fields) != 2:
                continue
            if weight is not None and weight < min_weight:
                continue
            a, b = fields[0].lower(), fields[1].lower()
            if a and b and a != b:
                pairs.append((a, b))
    return pairs


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_syn = sub.add_parser("synonyms", help="WordNet dict/ -> synset table")
    p_syn.add_argument("--wordnet_dir", required=True,
                       help="WordNet 3.0 'dict' directory (data.noun etc.)")
    p_syn.add_argument("-o", "--out", required=True)

    p_par = sub.add_parser("paraphrases",
                           help="paraphrase-en(.gz) -> phrase table")
    p_par.add_argument("--paraphrase_file", required=True,
                       help="METEOR 1.5 data/paraphrase-en.gz (or .txt)")
    p_par.add_argument("--min_weight", type=float, default=0.0,
                       help="drop weighted rows below this (0: keep all)")
    p_par.add_argument("-o", "--out", required=True)

    args = parser.parse_args(argv)
    if args.cmd == "synonyms":
        groups = parse_wordnet_synsets(args.wordnet_dir)
        with open(args.out, "w", encoding="utf-8") as f:
            for g in groups:
                f.write(" ".join(g) + "\n")
        print(f"wrote {len(groups)} synonym groups to {args.out}")
    else:
        pairs = parse_paraphrase_table(args.paraphrase_file, args.min_weight)
        with open(args.out, "w", encoding="utf-8") as f:
            for a, b in pairs:
                f.write(f"{a} ||| {b}\n")
        print(f"wrote {len(pairs)} paraphrase pairs to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
