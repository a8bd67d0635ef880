#!/usr/bin/env python3
"""Train the Builtin demo BPE merges for graft.functions.BpeVocab.

Byte-level BPE (Sennrich et al. 2016 / GPT-2 style) trained on the fixed
corpus below with the engine's simplified pre-tokenizer. Output: merge
lines in the published merges.txt format (GPT-2 byte-to-unicode alphabet,
space-separated pair per line, rank = line order). Deterministic — re-run
to regenerate the Builtin list embedded in BpeExpressions.scala.

Usage: python3 tools/train_bpe.py [n_merges]
"""
import sys, re, collections

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 96

CORPUS = (
    "the quick brown fox jumps over the lazy dog . "
    "the cat sat on the mat and the dog ran in the park . "
    "a bird flew over the house while the sun rose over the hill . "
    "data processing pipelines filter and deduplicate documents before "
    "training language models on the remaining text . "
    "the weighted mean and the weighted variance of the values are "
    "computed in one pass over the data . "
    "streaming ingestion admits new documents when their quality score "
    "clears the threshold and drops near duplicate texts . "
    "numbers like 123 and 2024 and punctuation , ; : ! ? are tokens too . "
) * 4

# the engine's simplified GPT-2-style pre-tokenizer (no contraction
# alternates, no trailing-space lookahead): optional single leading
# space + letter run / number run / other run, else whitespace run
PRETOK = re.compile(r" ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+")
# NOTE: python \w/\d differ subtly from \p{L}/\p{N}; for the ASCII
# training corpus above they agree exactly, which is all that matters
# for generating the demo merges (the ENGINE's scanner is the spec).

def bytes_to_unicode():
    # GPT-2's published byte<->unicode table
    bs = list(range(ord("!"), ord("~") + 1)) + \
         list(range(ord("\xa1"), ord("\xac") + 1)) + \
         list(range(ord("\xae"), ord("\xff") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))

B2U = bytes_to_unicode()

words = collections.Counter()
for tok in PRETOK.findall(CORPUS):
    words[tuple(B2U[b] for b in tok.encode("utf-8"))] += 1

merges = []
for _ in range(N_MERGES):
    pairs = collections.Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += c
    if not pairs:
        break
    # deterministic tie-break: max count, then lexicographic pair
    best = max(pairs.items(), key=lambda kv: (kv[1], [-ord(ch) for ch in "".join(kv[0])]))
    (l, r), c = best
    if c < 2:
        break
    merges.append((l, r))
    new_words = collections.Counter()
    for w, cnt in words.items():
        out, i = [], 0
        while i < len(w):
            if i < len(w) - 1 and w[i] == l and w[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(w[i])
                i += 1
        new_words[tuple(out)] += cnt
    words = new_words

print("#version: 0.2 (graft demo merges — tools/train_bpe.py)")
for l, r in merges:
    print(f"{l} {r}")
