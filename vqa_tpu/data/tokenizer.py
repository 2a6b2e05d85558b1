"""Question/caption tokenization and padding.

Faithful port of the reference's offline text pipeline
(`/root/reference/preprocessing.py:102-130`): lowercase, strip quote
boundaries and newlines, remove ``.,?``, split possessive ``'s``, whitespace
split; captions get ``<start>``/``<end>`` inserted *before* padding. Padding
truncates/pads to a fixed length with ``<pad>`` and reports the valid length.

The reference looks tokens up with ``list.index`` (O(vocab) per word,
preprocessing.py:117); ``Vocab`` uses a dict — identical ids, offline-only
speedup.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


class Vocab:
    """Vocabulary with O(1) token lookup; id order == file line order.

    The vocab file is GloVe words followed by the 4 specials
    ``<oov> <start> <end> <pad>`` (reference modules.py:181,
    util/utils.py:9-12 reads it with ``read().split('\\n')``).
    """

    SPECIALS = ("<oov>", "<start>", "<end>", "<pad>")

    def __init__(self, words: Sequence[str]):
        self.words: List[str] = list(words)
        # first occurrence wins, like list.index
        self._index = {}
        for i in range(len(self.words) - 1, -1, -1):
            self._index[self.words[i]] = i
        self.oov = self._index["<oov>"]
        self.start = self._index["<start>"]
        self.end = self._index["<end>"]
        self.pad = self._index["<pad>"]

    @classmethod
    def load(cls, vocab_path: str) -> "Vocab":
        """Read a newline-separated vocab file (util/utils.py:9-12 semantics)."""
        with open(vocab_path, encoding="utf-8") as f:
            return cls(f.read().split("\n"))

    def __len__(self) -> int:
        return len(self.words)

    def index(self, word: str) -> int:
        return self._index.get(word, self.oov)

    def __contains__(self, word: str) -> bool:
        return word in self._index


def get_tokens(sentence: str, vocab: Vocab, is_cap: bool = False
               ) -> Tuple[str, List[int]]:
    """Tokenize exactly like preprocessing.py:102-120.

    Returns (normalized sentence string, token id list).
    """
    sentence = sentence.lower()
    for c in [" '", "' ", ' "', '" ', "\n"]:
        sentence = sentence.replace(c, " ")
    for c in ".,?":
        sentence = sentence.replace(c, "")
    sentence = sentence.replace("'s", " 's")
    words = [w for w in sentence.split() if len(w) > 0]
    if is_cap:
        words.insert(0, "<start>")
        words.append("<end>")
    tokens = [vocab.index(w) for w in words]
    return " ".join(words), tokens


def padding(tokens: List[int], max_l: int, pad_id: int) -> Tuple[List[int], int]:
    """Pad/truncate to max_l, return (tokens, valid length)
    (preprocessing.py:124-130)."""
    l = min(len(tokens), max_l)
    if l < max_l:
        tokens = tokens + [pad_id] * (max_l - l)
    else:
        tokens = tokens[:l]
    return tokens, l


def soft_answer_scores(ans_dict: dict, ans_dim: int) -> List[float]:
    """Densify {ans_idx: count} into soft scores min(count,3)/3
    (dataset.py:85-90)."""
    out = [0.0] * ans_dim
    for key, value in ans_dict.items():
        out[int(key)] = min(value, 3) / 3.0
    return out
