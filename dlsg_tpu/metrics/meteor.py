"""METEOR metric — native re-implementation.

The reference wraps `meteor-1.5.jar` through a persistent Java subprocess and a
stdio SCORE/EVAL protocol (`caption-eval/pycocoevalcap/meteor/meteor.py:15-84`).
The jar and its ~1GB paraphrase data are NOT shipped in the reference repo
(`.MISSING_LARGE_BLOBS`), so exact jar-output parity is unverifiable even there;
this module implements the published METEOR 1.5 English scoring algorithm
(Denkowski & Lavie 2014) natively:

- match stages: exact > stem (Porter2/Snowball English) > paraphrase-lite
  (synonym/paraphrase tables are data files we cannot vendor; the stage is
  table-driven and pluggable via `set_paraphrase_table`).
- alignment: largest set of non-conflicting matches, resolved greedily
  left-to-right by stage priority, then chunk-minimizing tie-breaking —
  the standard METEOR beam-search objective approximated greedily.
- scoring: weighted P/R with function-word discounting (delta), parameterized
  fmean (alpha), fragmentation penalty (gamma, beta) with the METEOR 1.5
  English defaults alpha=.85, beta=.2, gamma=.6, delta=.75,
  stage weights (1.0, .6, .8, .6).
- corpus score: aggregate statistics over segments (METEOR's 'final score' is
  computed from summed statistics, not a mean of segment scores) — matching the
  jar's EVAL protocol semantics.

A C++ implementation of the aligner lives in dlsg_tpu/native; this Python
version is the always-available fallback with identical behavior.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from dlsg_tpu.metrics.stemmer import porter2_stem

# METEOR 1.5 English parameters (Denkowski & Lavie 2014, table 2)
ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
STAGE_WEIGHTS = (1.0, 0.6, 0.8)  # exact, stem, paraphrase

# A compact English function-word list (METEOR uses a corpus-derived list).
FUNCTION_WORDS = frozenset(
    """a an the this that these those some any each every no all both half
    i you he she it we they me him her us them my your his its our their
    is am are was were be been being do does did have has had will would
    shall should may might can could must of in on at by for with about
    against between into through during before after above below to from
    up down out off over under again further then once here there when
    where why how and or but if because as until while not so than too
    very s t just don now""".split()
)


_PARAPHRASE: Dict[str, frozenset] = {}


def set_paraphrase_table(table: Dict[str, Sequence[str]]) -> None:
    """Install a paraphrase/synonym table (word -> equivalents)."""
    global _PARAPHRASE
    _PARAPHRASE = {k: frozenset(v) for k, v in table.items()}


def _match_stage(h: str, r: str) -> int:
    """Return the first matching stage index, or -1."""
    if h == r:
        return 0
    if porter2_stem(h) == porter2_stem(r):
        return 1
    if r in _PARAPHRASE.get(h, ()) or h in _PARAPHRASE.get(r, ()):
        return 2
    return -1


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int, int]]:
    """Greedy stage-priority alignment: for each stage, match unmatched hyp
    words to unmatched ref words, preferring positionally-close pairs (keeps
    chunks low). Returns [(hyp_idx, ref_idx, stage)]."""
    matches: List[Tuple[int, int, int]] = []
    used_h = [False] * len(hyp)
    used_r = [False] * len(ref)
    for stage in range(len(STAGE_WEIGHTS)):
        for i, hw in enumerate(hyp):
            if used_h[i]:
                continue
            best_j, best_dist = -1, 10**9
            for j, rw in enumerate(ref):
                if used_r[j]:
                    continue
                if _match_stage(hw, rw) == stage:
                    d = abs(i - j)
                    if d < best_dist:
                        best_j, best_dist = j, d
            if best_j >= 0:
                used_h[i] = used_r[best_j] = True
                matches.append((i, best_j, stage))
    return sorted(matches)


def _count_chunks(matches: List[Tuple[int, int, int]]) -> int:
    """Number of contiguous, order-preserving match runs."""
    if not matches:
        return 0
    chunks = 1
    for (h0, r0, _), (h1, r1, _) in zip(matches, matches[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return chunks


def _weight(word: str) -> float:
    """Function-word discounting: content words weigh delta, function words
    (1 - delta)."""
    return (1.0 - DELTA) if word in FUNCTION_WORDS else DELTA


class SegmentStats:
    """Sufficient statistics of one hyp/ref pair (the jar's SCORE line reply)."""

    __slots__ = ("wp_num", "wp_den", "wr_num", "wr_den", "chunks", "raw_matches")

    def __init__(self, wp_num, wp_den, wr_num, wr_den, chunks, raw_matches):
        self.wp_num = wp_num
        self.wp_den = wp_den
        self.wr_num = wr_num
        self.wr_den = wr_den
        self.chunks = chunks
        self.raw_matches = raw_matches


def _segment_stats(hyp: List[str], ref: List[str]) -> SegmentStats:
    # native fast path (exact+stem only — valid while no paraphrase table is set)
    if not _PARAPHRASE:
        from dlsg_tpu import native

        st = native.meteor_stats(" ".join(hyp), " ".join(ref))
        if st is not None:
            return SegmentStats(st[0], st[1], st[2], st[3], int(st[4]), int(st[5]))
    matches = _align(hyp, ref)
    wp_num = sum(STAGE_WEIGHTS[s] * _weight(hyp[i]) for i, _, s in matches)
    wr_num = sum(STAGE_WEIGHTS[s] * _weight(ref[j]) for _, j, s in matches)
    wp_den = sum(_weight(w) for w in hyp)
    wr_den = sum(_weight(w) for w in ref)
    chunks = _count_chunks(matches)
    avg_len = 0.5 * (len(hyp) + len(ref))
    # all-words-match, single chunk -> zero fragmentation (METEOR convention)
    if matches and chunks == 1 and len(matches) == len(hyp) == len(ref):
        chunks = 0
    return SegmentStats(wp_num, wp_den, wr_num, wr_den, chunks, len(matches))


def _score_from_stats(st: SegmentStats) -> float:
    if st.wp_den == 0 or st.wr_den == 0 or st.raw_matches == 0:
        return 0.0
    p = st.wp_num / st.wp_den
    r = st.wr_num / st.wr_den
    if p == 0 or r == 0:
        return 0.0
    fmean = (p * r) / (ALPHA * p + (1 - ALPHA) * r)
    frag = st.chunks / st.raw_matches if st.raw_matches else 0.0
    penalty = GAMMA * (frag**BETA) if st.chunks > 0 else 0.0
    return (1.0 - penalty) * fmean


def score_pair(hypothesis: str, references: Sequence[str]) -> float:
    """Best score over references (METEOR scores against the best ref)."""
    hyp = hypothesis.split()
    best = 0.0
    for ref in references:
        best = max(best, _score_from_stats(_segment_stats(hyp, ref.split())))
    return best


class Meteor:
    """coco-caption Meteor API (`meteor/meteor.py:15-84`), Java-free."""

    def method(self) -> str:
        return "METEOR"

    def compute_score(self, gts, res):
        assert sorted(gts.keys()) == sorted(res.keys())
        ids = sorted(gts.keys())
        scores: List[float] = []
        agg = SegmentStats(0.0, 0.0, 0.0, 0.0, 0, 0)
        for id_ in ids:
            assert len(res[id_]) == 1
            hyp = res[id_][0].split()
            best_score, best_stats = 0.0, None
            for ref in gts[id_]:
                st = _segment_stats(hyp, ref.split())
                sc = _score_from_stats(st)
                if best_stats is None or sc > best_score:
                    best_score, best_stats = sc, st
            scores.append(best_score)
            agg.wp_num += best_stats.wp_num
            agg.wp_den += best_stats.wp_den
            agg.wr_num += best_stats.wr_num
            agg.wr_den += best_stats.wr_den
            agg.chunks += best_stats.chunks
            agg.raw_matches += best_stats.raw_matches
        return _score_from_stats(agg), scores
