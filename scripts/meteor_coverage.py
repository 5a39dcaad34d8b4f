"""Measure METEOR stage-2/3 table coverage of a caption corpus.

Usage:
    python scripts/meteor_coverage.py <references.txt> [...]

Each input file is either the reference's `vid\tsentence` format
(msvd/msr-vtt *_references.txt, evaluate.py:16-38) or plain text, one caption
per line. Reports, over the corpus's distinct CONTENT words (function words
excluded — they are what delta discounts, not what the match tables serve):

  - %% with a stage-2 (synonym, weight 0.8) entry,
  - %% with a stage-3 (paraphrase, weight 0.6) entry,
  - %% with any table entry (surface form or stem),
  - the most frequent uncovered words (candidates for table curation).

The MSVD/MSR-VTT caption pickles are not shipped in this image (nor in the
reference repo — .MISSING_LARGE_BLOBS), so the honest coverage number for the
real datasets must be produced by running this against the real
*_references.txt when data is mounted. The number is recorded in
BENCHMARKS.md "METEOR fidelity" whenever it is produced.
"""

from __future__ import annotations

import sys
from collections import Counter

from dlsg_tpu.metrics.meteor import (
    get_function_words,  # honors load_function_words_file / env overrides
    get_paraphrase_table,
    get_phrase_table,
    get_synonym_table,
    maybe_load_env_tables,
)
from dlsg_tpu.metrics.stemmer import porter2_stem
from dlsg_tpu.metrics.tokenizer import ptb_tokenize_line


def corpus_words(paths, phrase_counts: Counter = None, max_phrase_len: int = 0) -> Counter:
    maybe_load_env_tables()  # measure the configuration actually being scored
    function_words = get_function_words()
    counts: Counter = Counter()
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if "\t" in line:  # vid \t sentence reference format
                    line = line.split("\t", 1)[1]
                if not line:
                    continue
                toks = ptb_tokenize_line(line)
                for w in toks:
                    if w not in function_words and w.isalpha():
                        counts[w] += 1
                if phrase_counts is not None and max_phrase_len > 1:
                    for i in range(len(toks)):
                        for L in range(2, min(max_phrase_len, len(toks) - i) + 1):
                            phrase_counts[" ".join(toks[i : i + L])] += 1
    return counts


def covered(word: str, table) -> bool:
    return word in table or porter2_stem(word) in table


def main(argv) -> int:
    if not argv:
        print(__doc__)
        return 2
    syn, para = get_synonym_table(), get_paraphrase_table()
    phrases = get_phrase_table()
    max_pl = max((len(p.split()) for p in phrases), default=0)
    phrase_counts: Counter = Counter()
    counts = corpus_words(argv, phrase_counts, max_pl)
    n = len(counts)
    tok_total = sum(counts.values())
    s_hits = {w for w in counts if covered(w, syn)}
    p_hits = {w for w in counts if covered(w, para)}
    any_hits = s_hits | p_hits

    def pct(k):
        return 100.0 * k / max(n, 1)

    def tok_pct(words):
        return 100.0 * sum(counts[w] for w in words) / max(tok_total, 1)

    print(f"distinct content words: {n} ({tok_total} tokens)")
    print(f"stage-2 synonym coverage:   {len(s_hits):5d} types ({pct(len(s_hits)):.1f}%), {tok_pct(s_hits):.1f}% of tokens")
    print(f"stage-3 paraphrase coverage:{len(p_hits):5d} types ({pct(len(p_hits)):.1f}%), {tok_pct(p_hits):.1f}% of tokens")
    print(f"any-table coverage:         {len(any_hits):5d} types ({pct(len(any_hits)):.1f}%), {tok_pct(any_hits):.1f}% of tokens")
    uncovered = [(c, w) for w, c in counts.items() if w not in any_hits]
    uncovered.sort(reverse=True)
    print("top uncovered content words:", ", ".join(f"{w}({c})" for c, w in uncovered[:25]))

    # phrase-table (span paraphrase) stats: which table phrases occur in the
    # corpus at all — a phrase group only fires when one of its members shows
    # up as a contiguous span
    if phrases:
        seen = {p for p in phrases if phrase_counts.get(p, 0) > 0}
        occ = sum(phrase_counts[p] for p in seen)
        print(
            f"phrase table: {len(phrases)} phrases, {len(seen)} occur in corpus "
            f"({100.0 * len(seen) / len(phrases):.1f}%), {occ} span occurrences"
        )
        top = sorted(((phrase_counts[p], p) for p in seen), reverse=True)[:15]
        print("top occurring table phrases:", ", ".join(f"'{p}'({c})" for c, p in top))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
