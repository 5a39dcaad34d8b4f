"""Native C++ <-> Python equivalence tests (tokenizer, stemmer, METEOR aligner)."""

import pytest

from dlsg_tpu import native
from dlsg_tpu.metrics import meteor as meteor_mod
from dlsg_tpu.metrics import tokenizer as t
from dlsg_tpu.metrics.stemmer import porter2_stem

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (needs g++)"
)

SENTENCES = [
    "A man is playing a guitar on stage.",
    "don't stop the music",
    "the man's dog, and the dogs' bones",
    "hello (world) [again] {ok}",
    'she said "go home" loudly',
    "we'll see; they're here: it's fine!",
    "wait... what -- really?",
    "cannot gonna wanna gotta lemme",
    "a 3.5 inch screen costs $4, maybe 5%",
    "I'd've thought you'm weird",
    "",
    "   ",
    "one-two three--four",
]

WORDS = (
    "running plays played playing cats dogs happily generalization national "
    "rational agreed feed bleed dying lying tying skis skies news atlas "
    "conditional conditionally hopeful hopefulness activate activity "
    "sensational sensibility ability possibly communism communities arsenic "
    "generously nicely jumped jumps jumping y a be ox cry cries tried "
    "beautiful beautifully housing hoping hopping hopped exceed succeed "
    "proceeding inning earring entanglement government"
).split()


def _py_tokenize(line):
    """Pure-Python tokenizer path (bypassing the native fast path)."""
    from dlsg_tpu.metrics import tokenizer as t

    import re

    s = line.strip().lower()
    # replicate the module's own pure-python flow by calling through with the
    # native loader monkeypatched off
    return s


def test_tokenizer_equivalence(monkeypatch):
    from dlsg_tpu.metrics import tokenizer as t

    for sent in SENTENCES:
        nat = t.ptb_tokenize_line(sent)  # native path
        monkeypatch.setattr(native, "ptb_tokenize", lambda s, lowercase=True: None)
        py = t.ptb_tokenize_line(sent)  # pure python fallback
        monkeypatch.undo()
        assert nat == py, (sent, nat, py)


def test_stemmer_equivalence():
    for w in WORDS:
        assert native.porter2_stem(w) == porter2_stem(w), w


def test_meteor_stats_equivalence(monkeypatch):
    pairs = [
        ("a man plays guitar", "the man playing a guitar"),
        ("a dog runs fast", "the dog is running quickly"),
        ("identical sentence here", "identical sentence here"),
        ("totally different words", "nothing matches at all"),
        ("", "a reference"),
        # phrase-paraphrase span matches (phrase_paraphrases.txt)
        ("a lot of people are dancing", "many people are dancing"),
        ("the man sits down on a chair", "a man sits near a chair"),
        ("lots of cars on the road", "a lot of cars on a road"),
        ("a group of kids picks up the ball", "several kids grabs a ball"),
    ]
    for hyp, ref in pairs:
        nat = meteor_mod._segment_stats(hyp.split(), ref.split())
        monkeypatch.setattr(native, "meteor_stats", lambda a, b: None)
        py = meteor_mod._segment_stats(hyp.split(), ref.split())
        monkeypatch.undo()
        for attr in ("wp_num", "wp_den", "wr_num", "wr_den", "chunks", "raw_matches"):
            assert getattr(nat, attr) == pytest.approx(getattr(py, attr)), (
                hyp, ref, attr, getattr(nat, attr), getattr(py, attr),
            )


def test_tokenizer_corpus_lock(monkeypatch):
    """~100-sentence caption-domain corpus (abbreviations, decimals, hyphens,
    possessives, quotes, brackets, clitics, number-internal ,/:) with locked
    expected tokenizations — run through BOTH the Python and C++ paths."""
    import os

    corpus = os.path.join(os.path.dirname(__file__), "fixtures", "tokenizer_corpus.tsv")
    cases = [l.rstrip("\n").split("\t") for l in open(corpus)]
    assert len(cases) >= 100
    for sent, expect in cases:
        toks = expect.split(" ") if expect else []
        if native.available() and sent.isascii():
            assert t.ptb_tokenize_line(sent) == toks, ("native", sent)
        monkeypatch.setattr(native, "ptb_tokenize", lambda s, lowercase=True: None)
        assert t.ptb_tokenize_line(sent) == toks, ("python", sent)
        monkeypatch.undo()


def test_abbreviation_engine_sync(monkeypatch):
    """Every entry of tokenizer.ABBREVIATIONS must behave identically in the
    C++ and Python engines, mid-sentence and sentence-final — catches a lexicon
    entry added to one engine's hardcoded set but not the other, or an entry
    classed ALWAYS in one engine and CONTEXTUAL in the other."""
    assert not (t.ABBREV_ALWAYS & t.ABBREV_CONTEXTUAL)
    for abbr in sorted(t.ABBREVIATIONS):
        for sent in (f"a {abbr} b", f"see the {abbr}"):
            nat = t.ptb_tokenize_line(sent)
            monkeypatch.setattr(native, "ptb_tokenize", lambda x, lowercase=True: None)
            py = t.ptb_tokenize_line(sent)
            monkeypatch.undo()
            assert nat == py, (abbr, sent, nat, py)
        # lexicon semantics: mid-sentence the period always stays attached;
        # line-final it stays only for the ALWAYS class (CONTEXTUAL entries
        # are recognized with lookahead, like corenlp PTBLexer's JFlex rules)
        mid = t.ptb_tokenize_line(f"a {abbr} b")
        fin = t.ptb_tokenize_line(f"see the {abbr}")
        assert abbr in mid, (abbr, mid)
        if abbr in t.ABBREV_ALWAYS or len(abbr) == 2:
            # len==2: the single-initial rule ("b.") keeps the period in any
            # position, independent of abbreviation class ("v.")
            assert abbr in fin, (abbr, fin)
        else:
            assert fin[-2:] == [t.americanize(abbr[:-1]), "."], (abbr, fin)


def test_tokenizer_fuzz_python_cpp_identity(monkeypatch):
    """Random ASCII strings: the C++ tokenizer must equal the Python one."""
    import random
    import string

    if not native.available():
        pytest.skip("native library unavailable")
    alphabet = string.ascii_lowercase + string.digits + " .,;:!?'\"()-&%$#@{}[]/*"
    rng = random.Random(3)
    words = ["don't", "it's", "u.s.", "2,500", "10:30", "a&b", "...", "--",
             "cat", "dog's", "dogs'", "(hi)", '"q"', "'x'", "e.g.", "3.5",
             "and/or", "3/4", "*hi*", "colour", "colours", "colouring",
             "favourite", "theatre", "devour", "flour", "hour", "centre",
             "neighbourhood", "detour", "velour", "programme", "honours.",
             "tsp.", "hwy.", "messrs.", "nos.", "sat.", "wash.", "calif."]
    for _ in range(300):
        if rng.random() < 0.5:
            s = "".join(rng.choices(alphabet, k=rng.randint(0, 60)))
        else:
            s = " ".join(rng.choices(words, k=rng.randint(1, 12)))
        nat = t.ptb_tokenize_line(s)
        monkeypatch.setattr(native, "ptb_tokenize", lambda x, lowercase=True: None)
        py = t.ptb_tokenize_line(s)
        monkeypatch.undo()
        assert nat == py, (repr(s), nat, py)


def test_meteor_beam_aligner_fuzz_equivalence(monkeypatch):
    """Randomized hyp/ref pairs over a vocabulary rich in duplicates, stems,
    and synonym-table words must produce bit-identical stats from the C++ and
    Python beam aligners (same matches, chunks, and tie-breaking)."""
    import random

    if not native.available():
        pytest.skip("native library unavailable")
    vocab = (
        "a the man guy woman dog cat runs running run walks walking quickly "
        "slow slices cutting cuts chop guitar piano plays playing ball park "
        "kid child children is are and on in big large small "
        # phrase-table constituents: random draws form spans like 'a lot of',
        # 'sits down', 'next to', 'many', exercising the span-match path
        "lot of lots many sits down stands up next to beside gets out into "
        "exits people group several couple two pair front top"
    ).split()
    rng = random.Random(7)
    for _ in range(400):
        hyp = " ".join(rng.choices(vocab, k=rng.randint(1, 14)))
        ref = " ".join(rng.choices(vocab, k=rng.randint(1, 14)))
        nat = meteor_mod._segment_stats(hyp.split(), ref.split())
        monkeypatch.setattr(native, "meteor_stats", lambda a, b: None)
        py = meteor_mod._segment_stats(hyp.split(), ref.split())
        monkeypatch.undo()
        for attr in ("wp_num", "wp_den", "wr_num", "wr_den", "chunks", "raw_matches"):
            assert getattr(nat, attr) == pytest.approx(getattr(py, attr), abs=1e-12), (
                hyp, ref, attr, getattr(nat, attr), getattr(py, attr),
            )


def test_native_meteor_score_sanity():
    score = meteor_mod.score_pair(
        "a man is playing a guitar", ["a man is playing a guitar"]
    )
    assert score > 0.95
