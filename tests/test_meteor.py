"""METEOR 1.5 (vlp3d/eval/meteor.py) tests.

Three layers:
  * Porter2/Snowball stemmer vs the nltk SnowballStemmer oracle (nltk's
    English snowball is pure Python, no corpus download) on a large
    generated word list;
  * hand-computed worked examples of the full 1.5 scoring formula
    (alpha=0.85, beta=0.2, gamma=0.6; exact=1.0 / stem=0.6 weights);
  * behavioral checks: fewest-chunks alignment tie-break, best-of-
    multi-reference, optional synonym/paraphrase/function-word assets,
    micro-averaged corpus aggregation (the jar's EVAL-line semantics).

Reference behavior being replaced: lib/capeval/meteor/meteor.py:12-24
(java -jar meteor-1.5.jar - - -stdio -l en -norm).
"""

import math

import pytest

from vlp3d.eval.meteor import ALPHA, BETA, DELTA, GAMMA, Meteor15, stem

nltk = pytest.importorskip("nltk")
from nltk.stem.snowball import SnowballStemmer  # noqa: E402

pytestmark = pytest.mark.filterwarnings("ignore")


ROOTS = """
chair table cabinet window door wall floor ceiling couch sofa desk shelf
lamp pillow curtain carpet monitor keyboard picture frame towel sink
toilet bathtub refrigerator microwave oven counter stool bench bed
night stand dresser mirror trash can bin box bag book paper locate
describe find place sit stand hang lean rest face point look turn move
rotate align attach cover open close push pull lift lower slide roll
run walk jump swim fly carry bring take give make build create destroy
nation ration condition position relation station operation generation
communication organization rationalization sensational conditional
happy quick slow large small tall short wide narrow deep shallow bright
dark heavy light soft hard smooth rough clean dirty dry wet hot cold
agree disagree proceed exceed succeed feed need breed speed bleed
cry try fly dry apply supply reply deny rely marry carry hurry study
die lie tie vie dye eye ski sky news cosmos bias atlas andes howe
general generous generate communal commune arsenal arsenic
hope hoping hoped rope roping care caring cared bake baking baked
stop stopping stopped plan planning planned hop hopping hopped
red redder reddest big bigger biggest thin thinner thinnest
"""

SUFFIXES = [
    "", "s", "es", "ed", "ing", "ly", "ment", "ness", "ful", "less",
    "er", "est", "ion", "tion", "ation", "ational", "ization", "izer",
    "ally", "ically", "ousness", "iveness", "fulness", "ability",
    "ibility", "alism", "aliti", "ive", "ize", "ance", "ence", "able",
    "ible", "ant", "ent", "ism", "ate", "iti", "ous", "eedly", "edly",
    "ingly", "ies", "ied", "sses", "'s", "'s'",
]


def test_stemmer_matches_nltk_snowball_oracle():
    oracle = SnowballStemmer("english")
    words = set()
    for root in ROOTS.split():
        for suf in SUFFIXES:
            words.add(root + suf)
    mismatches = [
        (w, stem(w), oracle.stem(w))
        for w in sorted(words)
        if stem(w) != oracle.stem(w)
    ]
    assert not mismatches, (
        f"{len(mismatches)}/{len(words)} disagree, first 20: "
        f"{mismatches[:20]}"
    )


def _pen(frag):
    return GAMMA * math.pow(frag, BETA)


def _fmean(p, r):
    return p * r / (ALPHA * p + (1 - ALPHA) * r)


class TestWorkedExamples:
    def test_identical_sentence(self):
        # P=R=fmean=1; one chunk over m=6 matches; pen = 0.6*(1/6)^0.2
        m = Meteor15()
        got = m.score_segment("the cat sat on the mat",
                              ["the cat sat on the mat"])
        want = 1.0 * (1 - _pen(1 / 6))
        assert got == pytest.approx(want, abs=1e-12)
        assert got == pytest.approx(0.5807039, abs=1e-6)

    def test_insertion_in_reference(self):
        # hyp 6/6 matched, ref 6/7; alignment splits into 2 chunks at the
        # inserted word; avg matches 6 -> frag 1/3
        m = Meteor15()
        got = m.score_segment("the cat sat on the mat",
                              ["the cat was sat on the mat"])
        want = _fmean(1.0, 6 / 7) * (1 - _pen(2 / 6))
        assert got == pytest.approx(want, abs=1e-12)
        assert got == pytest.approx(0.4540336, abs=1e-6)

    def test_stem_only_matches(self):
        # both words match at the stem stage (weight 0.6): P=R=0.6,
        # fmean=0.6, one chunk over 2 matches
        m = Meteor15()
        got = m.score_segment("running quickly", ["run quick"])
        want = _fmean(0.6, 0.6) * (1 - _pen(1 / 2))
        assert got == pytest.approx(want, abs=1e-12)

    def test_no_overlap_scores_zero(self):
        m = Meteor15()
        assert m.score_segment("red chair", ["blue table"]) == 0.0

    def test_empty_hypothesis(self):
        m = Meteor15()
        assert m.score_segment("", ["a chair"]) == 0.0


class TestAlignment:
    def test_fewest_chunks_tiebreak(self):
        # "b" could align to ref position 1 or 4; fewest-chunks picks 1,
        # giving a single contiguous chunk
        m = Meteor15()
        got = m.score_segment("a b c", ["a b c d b"])
        want = _fmean(1.0, 3 / 5) * (1 - _pen(1 / 3))
        assert got == pytest.approx(want, abs=1e-12)

    def test_duplicate_words_one_to_one(self):
        # hyp has two "the" but ref only one: only one can match
        m = Meteor15()
        got = m.score_segment("the the", ["the"])
        want = _fmean(1 / 2, 1.0) * (1 - _pen(1 / 1))
        assert got == pytest.approx(want, abs=1e-12)

    def test_exact_preferred_over_stem(self):
        # "runs" matches "runs" exactly (w=1.0) rather than stemming onto
        # "running"; score must use the exact weight
        m = Meteor15()
        got = m.score_segment("runs", ["running runs"])
        want = _fmean(1.0, 1 / 2) * (1 - _pen(1 / 1))
        assert got == pytest.approx(want, abs=1e-12)


class TestCorpus:
    def test_best_reference_wins(self):
        m = Meteor15()
        multi = m.score_segment("a red chair", ["a blue table", "a red chair"])
        single = m.score_segment("a red chair", ["a red chair"])
        assert multi == pytest.approx(single)

    def test_micro_average_aggregation(self):
        # the corpus score is computed from SUMMED stats, not the mean of
        # per-segment scores (the jar's final EVAL line)
        m = Meteor15()
        gts = {"x": ["a b c d"], "y": ["p q"]}
        res = {"x": ["a b c d"], "y": ["z z"]}
        total, per = m.compute_score(gts, res)
        assert per[0] > 0 and per[1] == 0.0
        # summed: P = 4/6, R = 4/6, chunks=1, avg matches 4
        want = _fmean(4 / 6, 4 / 6) * (1 - _pen(1 / 4))
        assert total == pytest.approx(want, abs=1e-12)
        assert total != pytest.approx(sum(per) / 2)

    def test_capeval_alias(self):
        from vlp3d.eval.capeval import Meteor

        assert Meteor is Meteor15


class TestOptionalAssets:
    def test_synonym_stage(self, tmp_path):
        syn = tmp_path / "synonyms.txt"
        syn.write_text("sofa couch settee\n")
        m = Meteor15(synonyms_path=str(syn))
        got = m.score_segment("the sofa", ["the couch"])
        # "the" exact (1.0), sofa~couch synonym (0.8): P=R=1.8/2
        want = _fmean(0.9, 0.9) * (1 - _pen(1 / 2))
        assert got == pytest.approx(want, abs=1e-12)
        # without the table the synonym match disappears
        assert Meteor15().score_segment("the sofa", ["the couch"]) < got

    def test_paraphrase_stage(self, tmp_path):
        par = tmp_path / "paraphrase.txt"
        par.write_text("trash can ||| garbage bin\n")
        m = Meteor15(paraphrases_path=str(par))
        with_par = m.score_segment("the trash can", ["the garbage bin"])
        without = Meteor15().score_segment("the trash can",
                                           ["the garbage bin"])
        assert with_par > without

    def test_function_word_discount(self, tmp_path):
        fw = tmp_path / "function.words"
        fw.write_text("the\non\n")
        m = Meteor15(function_words_path=str(fw))
        plain = Meteor15()
        # hyp misses only a function word: delta-discounting should hurt
        # recall LESS than in the undccounted scorer
        hyp, ref = "cat sat mat", "the cat sat mat"
        assert m.score_segment(hyp, [ref]) > plain.score_segment(hyp, [ref])

    def test_delta_inert_without_function_words(self):
        # with no function-word list every word is content and delta
        # cancels: score must not depend on DELTA's value
        m = Meteor15()
        got = m.score_segment("a b", ["a b c"])
        want = _fmean(1.0, 2 / 3) * (1 - _pen(1 / 2))
        assert got == pytest.approx(want, abs=1e-12)


class TestNormalization:
    def test_punctuation_and_case(self):
        m = Meteor15()
        a = m.score_segment("The chair, next to the door.",
                            ["the chair next to the door"])
        b = m.score_segment("the chair , next to the door .",
                            ["the chair next to the door"])
        assert a == pytest.approx(b)
        assert a > 0.4
