"""Metric golden-value tests.

Expected numbers were produced by running the reference's vendored pure-Python
scorers (caption-eval/pycocoevalcap/{bleu,cider,rouge}) on the fixtures below —
our implementations must agree to float precision (SURVEY.md §4 'golden-value
tests').
"""

import numpy as np
import pytest

from dlsg_tpu.metrics.bleu import Bleu
from dlsg_tpu.metrics.cider import Cider
from dlsg_tpu.metrics.meteor import Meteor, score_pair
from dlsg_tpu.metrics.rouge import Rouge
from dlsg_tpu.metrics.scorer import COCOScorer, score_captions
from dlsg_tpu.metrics.stemmer import porter2_stem
from dlsg_tpu.metrics.tokenizer import ptb_tokenize_line, tokenize_captions

GTS = {
    "1": [
        "a man is playing a guitar on stage",
        "a person plays guitar",
        "the man played the guitar loudly",
    ],
    "2": [
        "a dog runs in the park",
        "the dog is running through a park",
        "a small dog running outside",
    ],
    "3": [
        "a woman is cooking food in a kitchen",
        "someone cooks a meal",
        "a woman prepares food",
    ],
    "4": ["two people are dancing", "a couple dances together", "people dance in a room"],
}
RES = {
    "1": ["a man is playing a guitar"],
    "2": ["a dog is running in the park"],
    "3": ["a woman is cooking in the kitchen"],
    "4": ["people are dancing together"],
}

# golden values from the reference scorers (see module docstring)
REF_BLEU = [0.9192232297, 0.8131924267, 0.7092584599, 0.5811646353]
REF_CIDER = 2.5193064191
REF_CIDER_PER = [3.22101897, 2.80363541, 1.97922657, 2.07334473]
REF_ROUGE = 0.7890410874
REF_ROUGE_PER = [0.83561644, 0.78005115, 0.79049676, 0.75]


def test_bleu_matches_reference():
    score, per = Bleu(4).compute_score(GTS, RES)
    np.testing.assert_allclose(score, REF_BLEU, rtol=1e-8)


def test_cider_matches_reference():
    score, per = Cider().compute_score(GTS, RES)
    np.testing.assert_allclose(score, REF_CIDER, rtol=1e-8)
    np.testing.assert_allclose(per, REF_CIDER_PER, rtol=1e-6)


def test_rouge_matches_reference():
    score, per = Rouge().compute_score(GTS, RES)
    np.testing.assert_allclose(score, REF_ROUGE, rtol=1e-8)
    np.testing.assert_allclose(per, REF_ROUGE_PER, rtol=1e-6)


def test_bleu_perfect_match_is_one():
    gts = {"a": ["the cat sat on the mat"]}
    res = {"a": ["the cat sat on the mat"]}
    score, _ = Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(score, [1.0] * 4, atol=1e-6)


def test_meteor_orders_quality():
    """METEOR must rank exact > partial > unrelated."""
    refs = ["a man is playing a guitar"]
    exact = score_pair("a man is playing a guitar", refs)
    partial = score_pair("a man plays a guitar", refs)
    bad = score_pair("purple elephants fly quickly", refs)
    assert exact > partial > bad
    assert exact > 0.9
    assert bad == 0.0


def test_meteor_stem_stage():
    """'plays'/'playing' should match through the stem stage."""
    assert porter2_stem("playing") == porter2_stem("plays") == "play"
    with_stem = score_pair("the man plays guitar", ["the man playing guitar"])
    assert with_stem > 0.5


def test_meteor_corpus_api():
    score, per = Meteor().compute_score(GTS, RES)
    assert 0.0 < score <= 1.0
    assert len(per) == 4
    assert all(0.0 <= s <= 1.0 for s in per)


def test_meteor_synonym_stage_by_default():
    """The shipped synonym table drives stage 3: 'guy slicing'/'man cutting'
    must score well above the same pair with synonyms disabled."""
    from dlsg_tpu.metrics.meteor import set_paraphrase_table, set_synonym_table

    hyp = "a guy is slicing a tomato"
    refs = ["a man is cutting a tomato"]
    with_syn = score_pair(hyp, refs)
    set_synonym_table({})  # disable stages 2 AND 3 (exact+stem only)
    set_paraphrase_table({})
    try:
        without = score_pair(hyp, refs)
    finally:
        set_synonym_table(None)  # restore the default tables
        set_paraphrase_table(None)
    assert with_syn > without + 0.15, (with_syn, without)
    assert with_syn > 0.8


def test_meteor_aligner_optimal_vs_bruteforce():
    """On tiny sentences, the beam-40 aligner must find the EXACT optimum of
    METEOR's lexicographic objective (max matched words, min chunks, min
    start-distance) — verified against exhaustive enumeration of all
    one-to-one word matchings (word stages only, duplicated words included:
    the ambiguity that defeats greedy matchers)."""
    import itertools
    import random

    from dlsg_tpu.metrics.meteor import (
        _align,
        _count_chunks,
        _match_stage,
        get_paraphrase_table,
        get_synonym_table,
        set_phrase_table,
    )

    def brute_force(hyp, ref):
        syn, para = get_synonym_table(), get_paraphrase_table()
        cands = [
            [(j, s) for j in range(len(ref))
             if (s := _match_stage(hyp[i], ref[j], syn, para)) >= 0]
            for i in range(len(hyp))
        ]
        best = None
        # enumerate every subset of hyp positions x injective ref assignment
        def rec(i, used, matches):
            nonlocal best
            if i == len(hyp):
                ml = tuple(matches)
                words = 2 * len(ml)
                chunks = _count_chunks(list(ml))
                dist = sum(abs(a - b) for a, b, _, _, _ in ml)
                key = (-words, chunks, dist, ml)
                if best is None or key < best:
                    best = key
                return
            rec(i + 1, used, matches)  # hyp[i] unmatched
            for j, s in cands[i]:
                if j not in used:
                    rec(i + 1, used | {j}, matches + [(i, j, 1, 1, s)])
        rec(0, frozenset(), [])
        return best

    rng = random.Random(11)
    vocab = ["a", "man", "dog", "runs", "plays", "the"]
    set_phrase_table({})  # word stages only (brute force enumerates words)
    try:
        for _ in range(40):
            hyp = [rng.choice(vocab) for _ in range(rng.randint(1, 6))]
            ref = [rng.choice(vocab) for _ in range(rng.randint(1, 6))]
            got = _align(hyp, ref)
            words = 2 * len(got)
            key_got = (
                -words,
                _count_chunks(got),
                sum(abs(a - b) for a, b, _, _, _ in got),
                tuple(got),
            )
            key_opt = brute_force(hyp, ref)
            assert key_got == key_opt, (hyp, ref, key_got, key_opt)
    finally:
        set_phrase_table(None)


def test_meteor_aligner_minimizes_chunks():
    """The beam aligner must prefer the 1-chunk alignment when a duplicated
    ref word offers an equal-cardinality but fragmented alternative — the
    failure mode of a greedy positional matcher."""
    from dlsg_tpu.metrics.meteor import _align, _count_chunks

    matches = _align("a b c".split(), "b a b c".split(), table={})
    assert len(matches) == 3
    assert _count_chunks(matches) == 1
    assert matches == [(0, 1, 1, 1, 0), (1, 2, 1, 1, 0), (2, 3, 1, 1, 0)]


def test_meteor_phrase_paraphrase_stage():
    """Multi-word phrase paraphrases align as spans (meteor-1.5's paraphrase
    stage over paraphrase-en.gz phrase pairs): 'a lot of people' ~ 'many
    people' must score far above what word-level stages alone give, and the
    span alignment must cover the phrase words one-to-one."""
    from dlsg_tpu.metrics.meteor import _align, set_phrase_table

    hyp = "a lot of people are dancing".split()
    ref = "many people are dancing".split()
    matches = _align(hyp, ref)
    # the 3-word hyp span [a lot of] matches the 1-word ref span [many]
    assert (0, 0, 3, 1, 3) in matches, matches
    with_phrases = score_pair(" ".join(hyp), [" ".join(ref)])
    set_phrase_table({})
    try:
        without = score_pair(" ".join(hyp), [" ".join(ref)])
    finally:
        set_phrase_table(None)
    assert with_phrases > without + 0.05, (with_phrases, without)
    assert with_phrases > 0.7, with_phrases

    # phrase <-> phrase both multi-word, and table symmetry (ref-side lookup)
    m2 = _align("lots of cars".split(), "a lot of cars".split())
    assert (0, 0, 2, 3, 3) in m2, m2
    # custom tables install and normalize whitespace
    set_phrase_table({"spins  around": ["rotates"]})
    try:
        m3 = _align("the top spins around".split(), "the top rotates".split())
        assert (2, 2, 2, 1, 3) in m3, m3
    finally:
        set_phrase_table(None)


def test_meteor_phrase_stage_respects_one_to_one():
    """A word consumed by a span match cannot also match as a single word, and
    spans never overlap used ref words (the aligner's one-to-one contract)."""
    from dlsg_tpu.metrics.meteor import _align

    # 'many' appears in ref once; the hyp has both 'a lot of' and 'many'.
    # Only one of them can take ref 'many'.
    hyp = "a lot of many people".split()
    ref = "many people".split()
    matches = _align(hyp, ref)
    used_ref = []
    for _, j, _, rl, _ in matches:
        used_ref.extend(range(j, j + rl))
    assert len(used_ref) == len(set(used_ref)), matches
    used_hyp = []
    for i, _, hl, _, _ in matches:
        used_hyp.extend(range(i, i + hl))
    assert len(used_hyp) == len(set(used_hyp)), matches


def test_meteor_matches_nltk_reference():
    """Independent validation of the scoring engine: configured with NLTK's
    METEOR parameters (alpha=.9 beta=3 gamma=.5, uniform word/stage weights,
    exact+stem only), our implementation must reproduce
    nltk.translate.meteor_score on fixtures where the maximal alignment is
    what both aligners find."""
    pytest.importorskip("nltk")
    from nltk.translate import meteor_score as nltk_ms

    from dlsg_tpu.metrics.meteor import (
        MeteorParams,
        _score_from_stats,
        _segment_stats,
        set_paraphrase_table,
        set_synonym_table,
    )
    from dlsg_tpu.metrics.stemmer import porter2_stem

    class StubWordnet:  # no synonym data: exact+stem only
        def synsets(self, word):
            return []

    class P2Stemmer:  # make nltk stem exactly like us
        def stem(self, w):
            return porter2_stem(w)

    # delta=0.5 makes word weights uniform (P = matches/len); uniform stage
    # weights make weighted counts equal raw counts
    params = MeteorParams(alpha=0.9, beta=3.0, gamma=0.5, delta=0.5, weights=(1.0, 1.0))
    # each matchable word appears once per sentence, so every maximal aligner
    # finds the same matching — isolating the scoring formula under test
    # (nltk's greedy matcher picks the LAST equal ref word, a provably worse
    # alignment on ambiguous inputs; see test_meteor_aligner_minimizes_chunks)
    fixtures = [
        ("the quick brown fox leaps over one lazy dog",
         "the quick brown fox jumped over that lazy dog"),
        ("a man plays his guitar on stage",
         "the man is playing some guitar"),
        ("children running in the park",
         "kids are running through a park"),
        ("the chef slices onions quickly",
         "a chef slicing an onion"),
        ("a dog chases the ball",
         "the dog chased a red ball"),
        ("this is an utterly unrelated sentence",
         "cats sleep on warm windowsills"),
    ]
    set_synonym_table({})
    set_paraphrase_table({})
    try:
        for hyp, ref in fixtures:
            ours = _score_from_stats(
                _segment_stats(hyp.split(), ref.split(), params), params
            )
            theirs = nltk_ms.single_meteor_score(
                ref.split(), hyp.split(),
                stemmer=P2Stemmer(), wordnet=StubWordnet(),
                alpha=0.9, beta=3.0, gamma=0.5,
            )
            assert ours == pytest.approx(theirs, abs=1e-9), (hyp, ours, theirs)
    finally:
        set_synonym_table(None)
        set_paraphrase_table(None)


def test_meteor_default_goldens_locked():
    """Behavior lock at METEOR 1.5 English defaults: any change to the
    aligner, parameters, weights, or the shipped synonym table shows up here."""
    cases = {
        ("a man is playing a guitar", "a man is playing a guitar"): 1.0,
        ("a man plays a guitar", "a man is playing a guitar"): 0.4138892,
        ("a guy is slicing a tomato", "a man is cutting a tomato"): 0.9,
        ("purple elephants fly quickly", "a man is playing a guitar"): 0.0,
    }
    for (hyp, ref), expect in cases.items():
        got = score_pair(hyp, [ref])
        assert got == pytest.approx(expect, abs=2e-7), (hyp, got)


def test_stemmer_cases():
    cases = {
        "running": "run",
        "cats": "cat",
        "happily": "happili",
        "generalization": "general",
        "agreed": "agre",
        "dogs": "dog",
    }
    for w, s in cases.items():
        assert porter2_stem(w) == s, (w, porter2_stem(w), s)


def test_ptb_tokenizer_basics():
    assert ptb_tokenize_line("A man, playing guitar.") == [
        "a", "man", ",", "playing", "guitar", ".",
    ]
    assert ptb_tokenize_line("don't stop") == ["do", "n't", "stop"]
    assert ptb_tokenize_line("the man's dog") == ["the", "man", "'s", "dog"]
    assert ptb_tokenize_line("hello (world)") == ["hello", "-LRB-", "world", "-RRB-"]


def test_tokenize_captions_removes_punct():
    caps = {"1": [{"caption": "A man, playing guitar."}]}
    out = tokenize_captions(caps)
    assert out == {"1": ["a man playing guitar"]}


def test_coco_scorer_full_pipeline():
    preds = {k: v[0] for k, v in RES.items()}
    scores = score_captions(GTS, preds)
    for key in ("Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert key in scores
    # tokenization strips trailing periods etc. but these fixtures have none,
    # so BLEU must equal the raw-string reference values
    np.testing.assert_allclose(scores["Bleu_4"], REF_BLEU[3], rtol=1e-6)
    np.testing.assert_allclose(scores["CIDEr"], REF_CIDER, rtol=1e-6)


def test_scorer_identical_prediction_scores_high():
    gts = {"1": ["a cat sleeps"], "2": ["a dog barks loudly"]}
    preds = {"1": "a cat sleeps", "2": "a dog barks loudly"}
    scores = score_captions(gts, preds)
    assert scores["Bleu_1"] > 0.99
    assert scores["ROUGE_L"] > 0.99
    assert scores["METEOR"] > 0.99


def test_meteor_coverage_script_runs(tmp_path, capsys):
    """scripts/meteor_coverage.py measures stage-2/3 table coverage of a
    reference txt — the tool that produces the real-data coverage number
    when MSVD/MSR-VTT caption files are available (BENCHMARKS.md)."""
    import importlib.util
    import os

    refs = tmp_path / "refs.txt"
    refs.write_text(
        "1\ta man is slicing a tomato\n1\ta guy cuts tomatoes\n"
        "2\tkids are playing soccer in a field\n"
    )
    spec = importlib.util.spec_from_file_location(
        "meteor_coverage",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "meteor_coverage.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main([str(refs)]) == 0
    out = capsys.readouterr().out
    assert "stage-2 synonym coverage" in out
    assert "stage-3 paraphrase coverage" in out
    assert "distinct content words: 10" in out


# ---------------------------------------------------------------------------
# Official paraphrase resource loading (meteor-1.5 paraphrase-en.gz / PPDB)
# ---------------------------------------------------------------------------


@pytest.fixture
def _restore_meteor_tables():
    yield
    from dlsg_tpu.metrics import meteor as M

    M.set_synonym_table(None)
    M.set_paraphrase_table(None)
    M.set_phrase_table(None)
    M.set_function_words(None)
    M._env_table_loaded.clear()


def _write_gz(path, text):
    import gzip

    with gzip.open(path, "wt") as f:
        f.write(text)


def test_load_official_paraphrase_formats(tmp_path, _restore_meteor_tables):
    """Every accepted line shape parses to the same pairs; gz sniffed by magic."""
    from dlsg_tpu.metrics import meteor as M

    variants = {
        "prob_first.txt": "0.71 ||| florp ||| blint\n0.9 ||| a flurn of ||| many\n",
        "prob_last.txt": "florp ||| blint ||| 0.71\na flurn of ||| many ||| 0.9\n",
        "no_prob.txt": "florp ||| blint\na flurn of ||| many\n",
        "ppdb_raw.txt": (
            "[X] ||| florp ||| blint ||| PPDB2.0Score=0.71 Feature=1 ||| 0-0\n"
            "[NP] ||| a flurn of ||| many ||| PPDB2.0Score=0.9 ||| 0-0 1-0\n"
        ),
        "tabs.txt": "florp\tblint\t0.71\na flurn of\tmany\t0.9\n",
    }
    for name, text in variants.items():
        p = tmp_path / name
        p.write_text(text)
        info = M.load_paraphrase_file(str(p))
        assert info["word_pairs"] == 1 and info["phrase_pairs"] == 1, (name, info)
        assert "blint" in M.get_paraphrase_table()["florp"], name
        assert "many" in M.get_phrase_table()["a flurn of"], name
    gz = tmp_path / "official.data"  # no .gz suffix: magic-byte sniffing
    _write_gz(gz, variants["prob_first.txt"])
    info = M.load_paraphrase_file(str(gz))
    assert info["word_pairs"] == 1 and info["phrase_pairs"] == 1


def test_load_official_min_score_and_skips(tmp_path, _restore_meteor_tables):
    from dlsg_tpu.metrics import meteor as M

    p = tmp_path / "t.txt"
    p.write_text(
        "0.9 ||| keepme ||| kept\n"
        "0.1 ||| dropme ||| dropped\n"
        "noscore ||| unscored\n"          # no score field: always kept
        "only_one_field\n"                # malformed: skipped
        "a ||| b ||| c ||| d\n"           # 4 phrases, not PPDB: skipped
        "same ||| same\n"                 # identity pair: skipped
    )
    info = M.load_paraphrase_file(str(p), min_score=0.5)
    tab = M.get_paraphrase_table()
    assert "kept" in tab["keepme"] and "unscored" in tab["noscore"]
    assert "dropme" not in tab
    assert info["word_pairs"] == 2 and info["lines_skipped"] == 3


def test_official_table_scoring_and_native_parity(tmp_path, monkeypatch,
                                                  _restore_meteor_tables):
    """Loaded pairs change scores, the native fast path stays active (tables
    mirrored to C++), and native/Python stats stay bit-equal on them."""
    from dlsg_tpu import native
    from dlsg_tpu.metrics import meteor as M

    hyp, ref = "a florp sits on a flurn of chairs", "a blint sits on many chairs"
    base = score_pair(hyp, [ref])
    p = tmp_path / "t.txt"
    p.write_text("florp ||| blint ||| 0.8\na flurn of ||| many ||| 0.8\n")
    info = M.load_paraphrase_file(str(p))
    assert score_pair(hyp, [ref]) > base
    if native.available():
        assert info["native_synced"] == 1
        for h, r in [
            (hyp, ref),
            ("a flurn of dogs florp around", "many dogs blint around"),
            ("nothing matches here", "completely disjoint words"),
        ]:
            nat = M._segment_stats(h.split(), r.split())
            monkeypatch.setattr(native, "meteor_stats", lambda a, b: None)
            py = M._segment_stats(h.split(), r.split())
            monkeypatch.undo()
            for attr in ("wp_num", "wp_den", "wr_num", "wr_den", "chunks",
                         "raw_matches"):
                assert getattr(nat, attr) == pytest.approx(getattr(py, attr)), (
                    h, r, attr)
    # restoring defaults must also restore the native tables: the pair must
    # stop matching through BOTH paths
    M.set_paraphrase_table(None)
    M.set_phrase_table(None)
    assert score_pair(hyp, [ref]) == pytest.approx(base)


def test_meteor_env_var_table(tmp_path, monkeypatch, _restore_meteor_tables):
    """$DLSG_METEOR_PARAPHRASE_FILE routes all scoring through the file."""
    from dlsg_tpu.metrics import meteor as M

    p = tmp_path / "env.txt"
    p.write_text("zorp ||| quux ||| 0.9\n")
    monkeypatch.setenv("DLSG_METEOR_PARAPHRASE_FILE", str(p))
    Meteor()  # any scorer construction triggers the env hook
    assert "quux" in M.get_paraphrase_table()["zorp"]


def test_load_synonym_file_formats(tmp_path, _restore_meteor_tables):
    """Groups format and pair format both install stage-2 synonyms."""
    from dlsg_tpu.metrics import meteor as M

    g = tmp_path / "groups.txt"
    g.write_text("florp blint zorp  # a 3-word group\nquux xyzzy\n")
    info = M.load_synonym_file(str(g))
    tab = M.get_synonym_table()
    assert info["word_pairs"] == 4  # C(3,2) + 1
    assert {"blint", "zorp"} <= tab["florp"] and "xyzzy" in tab["quux"]
    p = tmp_path / "pairs.txt"
    p.write_text("0.9 ||| florp ||| blint\nflorp ||| multi word ||| 0.9\n")
    info = M.load_synonym_file(str(p))
    assert info["word_pairs"] == 1 and info["lines_skipped"] == 1
    # stage-2 weight (0.8) > stage-3 (0.6): the same pair scores HIGHER as a
    # synonym than as a paraphrase
    hyp, ref = "a florp runs", "a blint runs"
    syn_score = score_pair(hyp, [ref])
    M.set_synonym_table(None)
    pfile = tmp_path / "para.txt"
    pfile.write_text("florp ||| blint\n")
    M.load_paraphrase_file(str(pfile))
    assert syn_score > score_pair(hyp, [ref]) > 0


def test_load_function_words_file(tmp_path, _restore_meteor_tables):
    """A custom function-word list changes delta discounting in BOTH engines."""
    from dlsg_tpu import native
    from dlsg_tpu.metrics import meteor as M

    hyp, ref = "the cat runs", "the cat walks"
    base = score_pair(hyp, [ref])
    fw = tmp_path / "fw.txt"
    # make 'cat' a function word (and keep the usual determiners)
    fw.write_text("the a an\ncat  # discounted now\n")
    info = M.load_function_words_file(str(fw))
    assert info["words"] == 4
    assert M.get_function_words() == frozenset({"the", "a", "an", "cat"})
    changed = score_pair(hyp, [ref])
    assert changed != pytest.approx(base)
    if native.available():
        assert info["native_synced"] == 1
        nat = M._segment_stats(hyp.split(), ref.split())
        import unittest.mock as mock

        with mock.patch.object(native, "meteor_stats", lambda a, b: None):
            py = M._segment_stats(hyp.split(), ref.split())
        for attr in ("wp_num", "wp_den", "wr_num", "wr_den", "chunks",
                     "raw_matches"):
            assert getattr(nat, attr) == pytest.approx(getattr(py, attr)), attr
    # restore: built-in list again, scores revert through both engines
    M.set_function_words(None)
    assert score_pair(hyp, [ref]) == pytest.approx(base)


def test_custom_synonyms_native_parity(tmp_path, monkeypatch,
                                       _restore_meteor_tables):
    """set_synonym_table customs are mirrored to C++ (round-4 unified sync):
    fast path stays on and stats agree."""
    from dlsg_tpu import native
    from dlsg_tpu.metrics import meteor as M

    if not native.available():
        pytest.skip("native library unavailable")
    M.set_synonym_table({"florp": ["blint"]})
    assert M._TABLES_NATIVE_SYNCED
    for h, r in [("a florp runs", "a blint walks"),
                 ("florp florp blint", "blint over there")]:
        nat = M._segment_stats(h.split(), r.split())
        monkeypatch.setattr(native, "meteor_stats", lambda a, b: None)
        py = M._segment_stats(h.split(), r.split())
        monkeypatch.undo()
        for attr in ("wp_num", "wp_den", "wr_num", "wr_den", "chunks",
                     "raw_matches"):
            assert getattr(nat, attr) == pytest.approx(getattr(py, attr)), (h, r, attr)


def test_unrepresentable_custom_table_disables_fast_path(_restore_meteor_tables):
    """A custom key the C++ group-file format cannot express (embedded tab
    would be re-tokenized by the native loader) must NOT mark the native
    mirror as synced — scoring falls back to the Python aligner."""
    from dlsg_tpu.metrics import meteor as M

    M.set_synonym_table({"a\tb": ["c"]})
    assert not M._TABLES_NATIVE_SYNCED
    M.set_synonym_table({"plain": ["words"]})  # representable again
    from dlsg_tpu import native

    if native.available():
        assert M._TABLES_NATIVE_SYNCED


def test_sync_reuses_one_temp_dir(_restore_meteor_tables):
    """Repeated table installs overwrite one temp dir instead of leaking a
    new dlsg_meteor_tables_* per sync."""
    from dlsg_tpu import native
    from dlsg_tpu.metrics import meteor as M

    if not native.available():
        pytest.skip("native library unavailable")
    M.set_paraphrase_table({"aa": ["bb"]})
    first = M._SYNC_DIR
    assert first is not None
    M.set_paraphrase_table({"cc": ["dd"]})
    M.set_synonym_table({"ee": ["ff"]})
    assert M._SYNC_DIR == first


def test_shipped_tables_have_no_dead_pairs_under_stage_precedence():
    """METEOR's stages run in precedence order (exact > stem > synonym >
    paraphrase, meteor.py:66), so a paraphrase pair whose words all already
    match at a higher stage can never fire. Lock the shipped tables free of
    such dead entries: word-paraphrase pairs must not be exact/stem/synonym
    matched, and equal-length phrase pairs must differ in at least one
    position under those higher stages."""
    from dlsg_tpu.metrics.meteor import (
        get_paraphrase_table,
        get_phrase_table,
        get_synonym_table,
    )
    from dlsg_tpu.metrics.stemmer import porter2_stem

    syn = get_synonym_table()

    def matched_higher(a: str, b: str) -> bool:
        if a == b:
            return True
        if porter2_stem(a) == porter2_stem(b):
            return True
        return b in syn.get(a, ()) or a in syn.get(b, ())

    dead = []
    for word, equivs in get_paraphrase_table().items():
        for other in equivs:
            if matched_higher(word, other):
                dead.append((word, other))
    assert not dead, f"word-paraphrase pairs dead under higher stages: {dead}"

    dead = []
    for phrase, equivs in get_phrase_table().items():
        words = phrase.split()
        for other in equivs:
            ow = other.split()
            if len(ow) == len(words) and all(
                matched_higher(a, b) for a, b in zip(words, ow)
            ):
                dead.append((phrase, other))
    assert not dead, f"phrase pairs dead under higher stages: {dead}"


def test_shipped_tables_have_no_duplicate_or_subset_groups():
    """Each data-file line is one equivalence group. A line whose member set
    exactly repeats — or is a strict subset of — another line adds nothing
    (the loaders merge groups per head word/phrase), and duplicated groups
    have twice bitten curation: batches re-added existing groups, and the
    round-4 cleanup removed 20 such lines. Lock the raw files clean."""
    import os

    import dlsg_tpu.metrics.meteor as m

    for path in (m._SYNONYMS_PATH, m._PARAPHRASES_PATH, m._PHRASES_PATH):
        groups = []  # (lineno, frozenset of members)
        with open(path, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                sep = "|||" if "|||" in line else None
                members = frozenset(
                    p.strip() for p in (line.split("|||") if sep else line.split())
                )
                groups.append((lineno, members))
        name = os.path.basename(path)
        seen = {}
        for lineno, key in groups:
            assert key not in seen, (
                f"{name}:{lineno} duplicates line {seen[key]}: {sorted(key)}"
            )
            seen[key] = lineno
        for i, (ln_a, a) in enumerate(groups):
            for ln_b, b in groups:
                assert not (ln_a != ln_b and a < b), (
                    f"{name}:{ln_a} {sorted(a)} is a strict subset of "
                    f"{name}:{ln_b} {sorted(b)}"
                )


def test_meteor_table_coverage_gate():
    """Coverage regression gate (VERDICT r4 #5): the shipped default tables'
    stage-2/3 coverage of the locked tokenizer-corpus vocabulary must not rot.

    Floors are the measured round-5 values (scripts/meteor_coverage.py over
    tests/fixtures/tokenizer_corpus.tsv). Covered-TYPE counts are monotone in
    corpus growth, so extending the corpus can only raise them — a failure
    here means table entries were removed or the loaders broke. Content
    parity beyond these tables comes from the official-resource loaders
    (load_synonym_file / load_paraphrase_file), not further hand-curation.
    """
    import os

    from dlsg_tpu.metrics.meteor import (
        get_function_words,
        get_paraphrase_table,
        get_phrase_table,
        get_synonym_table,
    )
    from dlsg_tpu.metrics.stemmer import porter2_stem
    from dlsg_tpu.metrics.tokenizer import ptb_tokenize_line

    corpus = os.path.join(os.path.dirname(__file__), "fixtures", "tokenizer_corpus.tsv")
    function_words = get_function_words()
    words = set()
    spans = set()
    with open(corpus, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if "\t" in line:
                line = line.split("\t", 1)[1]
            toks = ptb_tokenize_line(line)
            words.update(w for w in toks if w.isalpha() and w not in function_words)
            for i in range(len(toks)):
                for L in (2, 3, 4):
                    if i + L <= len(toks):
                        spans.add(" ".join(toks[i : i + L]))

    syn, para, phrases = get_synonym_table(), get_paraphrase_table(), get_phrase_table()

    def covered(w, table):
        return w in table or porter2_stem(w) in table

    s2 = sum(1 for w in words if covered(w, syn))
    s3 = sum(1 for w in words if covered(w, para))
    any_cov = sum(1 for w in words if covered(w, syn) or covered(w, para))
    phrase_hits = sum(1 for p in phrases if p in spans)

    assert s2 >= 189, f"stage-2 synonym coverage dropped: {s2} < 189 types"
    assert s3 >= 52, f"stage-3 paraphrase coverage dropped: {s3} < 52 types"
    assert any_cov >= 194, f"any-table coverage dropped: {any_cov} < 194 types"
    assert len(phrases) >= 537, f"phrase table shrank: {len(phrases)} < 537"
    assert phrase_hits >= 6, f"corpus-occurring phrases dropped: {phrase_hits} < 6"
