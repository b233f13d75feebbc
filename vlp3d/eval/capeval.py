"""Caption metrics: BLEU-4, CIDEr, ROUGE-L, METEOR — pure Python.

Drop-in equivalents of the vendored pycocoevalcap-style scorers the
reference uses (`lib/capeval/{bleu,cider,rouge,meteor}`): same interface
(score(gts, res) with dicts key -> list[str]) and the standard published
algorithms:

  * BLEU: Papineni et al. corpus BLEU with per-corpus brevity penalty and
    "closest" reference length, n = 1..4;
  * CIDEr: Vedantam et al. tf-idf weighted n-gram cosine consensus
    (n = 1..4, sigma = 6 length penalty), corpus-level idf;
  * ROUGE-L: Lin et al. LCS F-measure with beta = 1.2, max over refs;
  * METEOR: pure-Python exact+stem-lite matcher with the standard
    alpha=0.9/beta=3/gamma=0.5 parametrization. NOTE: the reference shells
    out to meteor-1.5.jar (lib/capeval/meteor/meteor.py:12-24) which adds
    WordNet synonym matching; this implementation uses exact + suffix-strip
    matching only, so absolute values differ slightly from the jar.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def _tokens(s: str) -> list:
    return s.lower().split()


def _ngrams(tokens, n):
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


# --------------------------------------------------------------- BLEU
class Bleu:
    def __init__(self, n: int = 4):
        self.n = n

    def compute_score(self, gts: dict, res: dict):
        small = 1e-9
        tiny = 1e-15
        clipped = [0.0] * self.n
        totals = [0.0] * self.n
        cand_len = 0
        ref_len = 0
        per_sample = [[] for _ in range(self.n)]

        for key in gts:
            hyp = _tokens(res[key][0])
            refs = [_tokens(r) for r in gts[key]]
            cand_len += len(hyp)
            # closest reference length
            ref_len += min(
                (abs(len(r) - len(hyp)), len(r)) for r in refs
            )[1]
            sample_c = []
            sample_t = []
            for n in range(1, self.n + 1):
                h = _ngrams(hyp, n)
                max_ref = Counter()
                for r in refs:
                    for gram, cnt in _ngrams(r, n).items():
                        max_ref[gram] = max(max_ref[gram], cnt)
                c = sum(min(cnt, max_ref[g]) for g, cnt in h.items())
                t = max(len(hyp) - n + 1, 0)
                clipped[n - 1] += c
                totals[n - 1] += t
                sample_c.append(c)
                sample_t.append(t)
            # per-sample smoothed scores (pycocoevalcap reports these too)
            prod = 1.0
            for n in range(self.n):
                prod *= (sample_c[n] + tiny) / (sample_t[n] + small)
                per_sample[n].append(prod ** (1.0 / (n + 1)))

        bp = (
            1.0
            if cand_len > ref_len
            else math.exp(1 - ref_len / (cand_len + small))
        )
        scores = []
        prod = 1.0
        for n in range(self.n):
            prod *= (clipped[n] + tiny) / (totals[n] + small)
            scores.append(bp * (prod ** (1.0 / (n + 1))))
        return scores, per_sample

    def score(self, gts, res):
        return self.compute_score(gts, res)


# --------------------------------------------------------------- CIDEr
class Cider:
    def __init__(self, n: int = 4, sigma: float = 6.0):
        self.n = n
        self.sigma = sigma

    def compute_score(self, gts: dict, res: dict):
        # document frequency over reference sets
        df = defaultdict(float)
        for key in gts:
            seen = set()
            for r in gts[key]:
                for n in range(1, self.n + 1):
                    seen.update(_ngrams(_tokens(r), n).keys())
            for g in seen:
                df[g] += 1.0
        log_m = math.log(max(len(gts), 1))

        def tfidf_vec(tokens):
            vecs = []
            lengths = []
            for n in range(1, self.n + 1):
                cnt = _ngrams(tokens, n)
                total = max(sum(cnt.values()), 1)
                vec = {}
                norm = 0.0
                for g, c in cnt.items():
                    idf = log_m - math.log(max(df[g], 1.0))
                    w = (c / total) * idf
                    vec[g] = w
                    norm += w * w
                vecs.append((vec, math.sqrt(norm)))
                lengths.append(len(tokens))
            return vecs

        scores = []
        for key in gts:
            hyp_t = _tokens(res[key][0])
            hv = tfidf_vec(hyp_t)
            score = 0.0
            for r in gts[key]:
                ref_t = _tokens(r)
                rv = tfidf_vec(ref_t)
                sim = 0.0
                for n in range(self.n):
                    (h_vec, h_norm), (r_vec, r_norm) = hv[n], rv[n]
                    num = sum(
                        h_vec[g] * r_vec[g] for g in h_vec if g in r_vec
                    )
                    if h_norm > 0 and r_norm > 0:
                        sim_n = num / (h_norm * r_norm)
                    else:
                        sim_n = 0.0
                    delta = len(hyp_t) - len(ref_t)
                    sim_n *= math.exp(
                        -(delta**2) / (2 * self.sigma**2)
                    )
                    sim += sim_n
                score += sim / self.n
            scores.append(10.0 * score / max(len(gts[key]), 1))
        mean = sum(scores) / max(len(scores), 1)
        return mean, scores

    def score(self, gts, res):
        return self.compute_score(gts, res)


# --------------------------------------------------------------- ROUGE-L
def _lcs_len(a, b):
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


class Rouge:
    beta = 1.2

    def compute_score(self, gts: dict, res: dict):
        scores = []
        for key in gts:
            hyp = _tokens(res[key][0])
            best = 0.0
            for r in gts[key]:
                ref = _tokens(r)
                lcs = _lcs_len(hyp, ref)
                if lcs == 0:
                    continue
                p = lcs / max(len(hyp), 1)
                rr = lcs / max(len(ref), 1)
                f = (
                    (1 + self.beta**2)
                    * p
                    * rr
                    / (rr + self.beta**2 * p)
                )
                best = max(best, f)
            scores.append(best)
        mean = sum(scores) / max(len(scores), 1)
        return mean, scores

    def score(self, gts, res):
        return self.compute_score(gts, res)


# --------------------------------------------------------------- METEOR
def _stem_lite(w):
    for suf in ("ing", "ed", "es", "s"):
        if len(w) > len(suf) + 2 and w.endswith(suf):
            return w[: -len(suf)]
    return w


class Meteor:
    alpha = 0.9
    beta = 3.0
    gamma = 0.5

    def _align(self, hyp, ref):
        """Greedy exact-then-stem alignment; returns matched index pairs."""
        matches = []
        used = set()
        for stage in (lambda w: w, _stem_lite):
            for i, h in enumerate(hyp):
                if any(m[0] == i for m in matches):
                    continue
                for j, r in enumerate(ref):
                    if j in used:
                        continue
                    if stage(h) == stage(r):
                        matches.append((i, j))
                        used.add(j)
                        break
        return sorted(matches)

    def _chunks(self, matches):
        if not matches:
            return 0
        chunks = 1
        for (i1, j1), (i2, j2) in zip(matches, matches[1:]):
            if i2 != i1 + 1 or j2 != j1 + 1:
                chunks += 1
        return chunks

    def _single(self, hyp, ref):
        matches = self._align(hyp, ref)
        m = len(matches)
        if m == 0:
            return 0.0
        p = m / len(hyp)
        r = m / len(ref)
        f = p * r / (self.alpha * p + (1 - self.alpha) * r)
        frag = self._chunks(matches) / m
        penalty = self.gamma * (frag**self.beta)
        return f * (1 - penalty)

    def compute_score(self, gts: dict, res: dict):
        scores = []
        for key in gts:
            hyp = _tokens(res[key][0])
            best = max(
                (self._single(hyp, _tokens(r)) for r in gts[key]),
                default=0.0,
            )
            scores.append(best)
        mean = sum(scores) / max(len(scores), 1)
        return mean, scores

    def score(self, gts, res):
        return self.compute_score(gts, res)
