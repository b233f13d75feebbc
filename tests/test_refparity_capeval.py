"""DIRECT parity for the caption metric scorers: the reference's vendored
pycocoevalcap-style BLEU / CIDEr / ROUGE-L (lib/capeval/{bleu,cider,rouge})
vs our re-derived pure-Python scorers (vlp3d/eval/capeval.py) on a shared
synthetic corpus. METEOR is excluded: the reference shells out to a Java
jar that is not in the checkout (meteor-1.5.jar, git-ignored)."""

import numpy as np
import pytest

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.eval.capeval import Bleu, Cider, Rouge


@pytest.fixture(scope="module")
def corpus(torch):
    rng = np.random.default_rng(17)
    vocab = ("the a chair table sits next to red blue large small box "
             "on left right of room corner door window shelf it this "
             "is near far wooden metal round square").split()

    def sent(n):
        return " ".join(rng.choice(vocab, size=n))

    gts, res = {}, {}
    for i in range(24):
        key = f"scene{i//3}|obj{i%3}|chair"
        gts[key] = [f"sos {sent(int(rng.integers(4, 14)))} eos"
                    for _ in range(int(rng.integers(1, 4)))]
        # half the candidates share words with a reference, half random
        if i % 2 == 0:
            base = gts[key][0].split()
            keep = rng.uniform(size=len(base)) > 0.4
            cand = [w for w, k in zip(base, keep) if k] or ["sos"]
            res[key] = [" ".join(cand)]
        else:
            res[key] = [f"sos {sent(int(rng.integers(3, 10)))} eos"]
    return gts, res


@pytest.fixture(scope="module")
def torch():
    return load_reference()


def test_bleu(torch, corpus):
    from lib.capeval.bleu.bleu import Bleu as RefBleu

    gts, res = corpus
    ref_score, ref_scores = RefBleu(4).compute_score(gts, res)
    ours_score, ours_scores = Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(ours_score, ref_score, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ours_scores, float), np.asarray(ref_scores, float),
        atol=1e-9)


def test_cider(torch, corpus):
    from lib.capeval.cider.cider import Cider as RefCider

    gts, res = corpus
    ref_score, ref_scores = RefCider().compute_score(gts, res)
    ours_score, ours_scores = Cider().compute_score(gts, res)
    np.testing.assert_allclose(ours_score, ref_score, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ours_scores, float), np.asarray(ref_scores, float),
        atol=1e-9)


def test_rouge(torch, corpus):
    from lib.capeval.rouge.rouge import Rouge as RefRouge

    gts, res = corpus
    ref_score, ref_scores = RefRouge().compute_score(gts, res)
    ours_score, ours_scores = Rouge().compute_score(gts, res)
    np.testing.assert_allclose(ours_score, ref_score, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ours_scores, float), np.asarray(ref_scores, float),
        atol=1e-9)
